"""Training-shard export (operators/export.py): the global rank is a
true permutation, reproducible across partition counts, and the shard
layout is full-except-last with a matching manifest."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etlhelper_spark.operators.export import (
    deterministic_shuffle_rank,
    write_training_shards,
)


def _docs(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )


def test_rank_is_a_permutation(spark):
    ranked = deterministic_shuffle_rank(_docs(spark), ["doc_id"], seed=7)
    ranks = sorted(r["rank"] for r in ranked.collect())
    assert ranks == list(range(100))


def test_rank_deterministic_across_partitionings(spark):
    a = {
        r["doc_id"]: r["rank"]
        for r in deterministic_shuffle_rank(
            _docs(spark), ["doc_id"], seed=7, partitions=2
        ).collect()
    }
    b = {
        r["doc_id"]: r["rank"]
        for r in deterministic_shuffle_rank(
            _docs(spark).repartition(13), ["doc_id"], seed=7, partitions=9
        ).collect()
    }
    assert a == b


def test_rank_follows_md5_order(spark):
    rows = deterministic_shuffle_rank(
        _docs(spark, 20), ["doc_id"], seed=3
    ).collect()
    import hashlib

    def h(i):
        return hashlib.md5(f"3|{i}".encode()).hexdigest()

    expect = sorted(range(20), key=lambda i: (h(i), i))
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == expect


def test_shards_full_except_last_and_manifest(spark):
    work = tempfile.mkdtemp(prefix="ehs_export_t_")
    try:
        manifest = write_training_shards(
            _docs(spark, 103), work, ["doc_id"], rows_per_shard=25, seed=1
        )
        sizes = {r["shard"]: r["n_rows"] for r in manifest.collect()}
        assert sizes == {0: 25, 1: 25, 2: 25, 3: 25, 4: 3}
        back = spark.read.parquet(os.path.join(work, "shards"))
        assert back.count() == 103
        assert back.select("doc_id").distinct().count() == 103
        # intra-shard pos is dense 0..n-1
        pos = sorted(
            r["pos"]
            for r in back.where(F.col("shard") == 4).collect()
        )
        assert pos == [0, 1, 2]
    finally:
        shutil.rmtree(work, ignore_errors=True)
