"""Sketch state is STORABLE: write per-hour HLL/theta sketches to
parquet, read them back, and re-union — the estimate must match the
direct aggregate. This is the property the q109-q111 rollup family
relies on at 100 TB (persist kB of sketch per window, never re-scan)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def sketch_dir():
    d = tempfile.mkdtemp(prefix="ehs_sketch_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_hll_sketches_roundtrip_parquet(spark, src_conn, sketch_dir):
    e = src_conn.table_dataframe("events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    hourly.write.mode("overwrite").parquet(sketch_dir)

    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    from_store = (
        spark.read.parquet(sketch_dir)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .collect()[0]["est"]
    )
    assert from_store == direct  # same sketch algebra, not approx-equal


def test_theta_sketches_roundtrip_and_intersect(spark, src_conn, sketch_dir):
    e = src_conn.table_dataframe("events").where(
        F.col("event_type").isin("view", "purchase")
    )
    per_type = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sketch")
    )
    per_type.write.mode("overwrite").parquet(sketch_dir)

    stored = spark.read.parquet(sketch_dir)
    pair = (
        stored.groupBy()
        .pivot("event_type", ["view", "purchase"])
        .agg(F.first("sketch"))
    )
    est = pair.select(
        F.theta_sketch_estimate(
            F.theta_intersection("view", "purchase")
        ).alias("inter")
    ).collect()[0]["inter"]
    exact = (
        e.groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "view").alias("v"),
            F.max(F.col("event_type") == "purchase").alias("p"),
        )
        .where(F.col("v") & F.col("p"))
        .count()
    )
    # below nominal entries the theta sketch is exact
    assert est == pytest.approx(exact, abs=0.5)
