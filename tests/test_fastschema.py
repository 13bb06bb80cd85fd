"""footer_spark_schema / read_parquet_state: the zero-job state read
(r13). The helper must return EXACTLY the schema Spark's own parquet
inference would produce (including nullability) for every layout the
state stores use, schedule no job doing it, and fall back to the
inferring read whenever the footer cannot decide the Spark type
(timestamps), so converting a call site can never change results.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from etlhelper_spark.functions.util import (
    footer_spark_schema,
    read_parquet_state,
)


def _state_frame(spark):
    """One column of every type the versioned state stores write."""
    return spark.range(3).select(
        F.col("id").alias("l"),
        F.col("id").cast("int").alias("i"),
        F.col("id").cast("double").alias("d"),
        (F.col("id") % 2 == 0).alias("b"),
        F.col("id").cast("string").alias("s"),
        F.array(F.col("id").cast("double"), F.lit(2.5)).alias("arr"),
        F.col("id").cast("decimal(38,10)").alias("dec"),
        F.struct(
            F.col("id").alias("ord"), F.col("id").cast("string").alias("v")
        ).alias("st"),
    )


def _n_jobs(spark) -> int:
    return spark._jsc.sc().statusStore().jobsList(None).size()


def test_flat_dir_schema_parity_and_zero_jobs(spark, tmp_path):
    p = str(tmp_path / "flat")
    _state_frame(spark).write.parquet(p)
    bare = spark.read.parquet(p)
    before = _n_jobs(spark)
    fast = read_parquet_state(spark, p)
    assert _n_jobs(spark) == before  # no inference job scheduled
    assert fast.schema == bare.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, bare.collect())
    )


def test_partitioned_dir_appends_discovered_columns(spark, tmp_path):
    p = str(tmp_path / "part")
    _state_frame(spark).withColumn("batch", F.lit(3)).write.partitionBy(
        "batch"
    ).parquet(p)
    bare = spark.read.parquet(p)
    fast = read_parquet_state(spark, p)
    assert fast.schema == bare.schema  # incl. appended partition col
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, bare.collect())
    )


def test_multi_leaf_paths(spark, tmp_path):
    a = str(tmp_path / "m" / "batch=0")
    b = str(tmp_path / "m" / "batch=1")
    _state_frame(spark).write.parquet(a)
    _state_frame(spark).write.parquet(b)
    bare = spark.read.parquet(a, b)
    fast = read_parquet_state(spark, a, b)
    assert fast.schema == bare.schema
    assert fast.count() == bare.count() == 6


def test_timestamp_store_falls_back(spark, tmp_path):
    p = str(tmp_path / "ts")
    spark.sql(
        "select timestamp'2020-01-01 00:00:00' as t, 1 as x"
    ).write.parquet(p)
    assert footer_spark_schema(p) is None  # inference owns timestamps
    assert read_parquet_state(spark, p).schema == spark.read.parquet(
        p
    ).schema


def test_single_file_path_resolves(spark, tmp_path):
    """A path naming one parquet FILE (the base-table layout) resolves
    from that file's own footer — FileSelector only walks directories,
    so the file form needs its own branch."""
    import glob

    d = str(tmp_path / "one")
    _state_frame(spark).coalesce(1).write.parquet(d)
    f = glob.glob(os.path.join(d, "*.parquet"))[0]
    bare = spark.read.parquet(f)
    fast = read_parquet_state(spark, f)
    assert footer_spark_schema(f) is not None
    assert fast.schema == bare.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, bare.collect())
    )


def test_micros_timestamps_resolve_with_session(spark, tmp_path):
    """With the session supplied, micro-precision timestamps resolve
    exactly: tz-aware maps to TimestampType, tz-naive follows the
    session's inferTimestampNTZ conf — both pinned against Spark's
    own inference. Without a session, timestamps still fall back."""
    p = str(tmp_path / "tsus")
    spark.sql(
        "select timestamp'2020-01-01 00:00:00' as t, "
        "timestamp_ntz'2020-01-02 00:00:00' as tn, 1 as x"
    ).write.parquet(p)
    assert footer_spark_schema(p) is None  # no session -> fall back
    assert footer_spark_schema(p, spark=spark) is not None
    # compare at the READ level: the file source forces nullability on
    # a user-passed schema exactly as inference does
    bare = spark.read.parquet(p)
    fast = read_parquet_state(spark, p)
    assert fast.schema == bare.schema
    assert sorted(map(str, fast.collect())) == sorted(
        map(str, bare.collect())
    )


def test_base_table_reader_schema_and_rows_identical(spark):
    """read_parquet_table (every query body's _t) pre-resolves the
    schema driver-side; schema AND rows must be identical to the bare
    inferring read for every testdata table."""
    from etlhelper_spark.sources.parquet import read_parquet_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in (
        "region", "nation", "supplier", "orders", "events", "embeddings",
    ):
        p = f"/root/testdata/sf0.001/{t}.parquet"
        fast = read_parquet_table(spark, p)
        bare = spark.read.parquet(p)
        assert fast.schema == bare.schema, t
        assert sorted(map(str, fast.collect())) == sorted(
            map(str, bare.collect())
        ), t


def test_empty_dir_falls_back_to_inferring_error(spark, tmp_path):
    p = str(tmp_path / "empty")
    os.makedirs(p)
    assert footer_spark_schema(p) is None
    try:
        read_parquet_state(spark, p)
        raised = False
    except Exception:
        raised = True  # same UNABLE_TO_INFER_SCHEMA the bare read gives
    assert raised


def test_sidecar_dirs_invisible(spark, tmp_path):
    # _pivots must not contribute the schema (Spark's visibility rule)
    p = str(tmp_path / "idx")
    _state_frame(spark).write.parquet(p)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(p, "_pivots"))
    pq.write_table(
        pa.table({"other": [1]}),
        os.path.join(p, "_pivots", "part-0.parquet"),
    )
    # compare through the read (file sources normalize nullability)
    assert (
        read_parquet_state(spark, p).schema
        == spark.read.parquet(p).schema
    )
    names = [f.name for f in footer_spark_schema(p).fields]
    assert "other" not in names
