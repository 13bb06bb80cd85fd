"""Sequence packing (functions/packing.py): budget invariant, exactly-
once coverage, running-sum offsets, partition invariance, oversize
modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.packing import pack_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_budget_and_exactly_once(spark, docs):
    out = pack_documents(docs, budget=256, n_shards=8).localCheckpoint()
    n_docs = docs.count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # no pack exceeds the budget
    over = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .where(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    # packs never cross shards: pack_id >> 32 recovers the shard
    crossed = out.where(
        F.expr("shiftright(pack_id, 32)") != F.col("shard")
    ).count()
    assert crossed == 0


def test_offsets_are_running_sums(spark, docs):
    out = pack_documents(docs, budget=256, n_shards=8)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("pack_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bad = out.withColumn(
        "expect", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).where(F.col("expect") != F.col("offset"))
    assert bad.count() == 0


def test_partition_invariance(spark, docs):
    a = sorted(
        map(tuple, pack_documents(docs, 256, n_shards=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_documents(docs.repartition(13), 256, n_shards=8).collect(),
        )
    )
    assert a == b


def test_oversize_modes(spark):
    rows = [(i, "tok " * n) for i, n in [(1, 5), (2, 40), (3, 6)]]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(Exception, match="tokens > budget"):
        pack_documents(d, budget=16, n_shards=1).collect()
    kept = pack_documents(d, budget=16, n_shards=1, oversize="drop")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    own = pack_documents(
        d, budget=16, n_shards=1, oversize="own_pack"
    ).collect()
    by_id = {r.doc_id: r for r in own}
    # the oversized doc sits alone in its own pack
    assert by_id[2].pack_id not in (by_id[1].pack_id, by_id[3].pack_id)
    assert by_id[2].offset == 0


def test_precomputed_tokens_col_and_validation(spark, docs):
    pre = docs.withColumn("nt", F.size(F.split(F.trim("text"), r"\s+")))
    out = pack_documents(pre, 256, tokens_col="nt", n_shards=4)
    assert out.count() == docs.count()
    with pytest.raises(ValueError, match="numeric id"):
        pack_documents(
            docs.withColumn("doc_id", F.col("doc_id").cast("string")), 256
        )
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, 0)
    with pytest.raises(ValueError, match="oversize"):
        pack_documents(docs, 256, oversize="truncate")


def test_order_col_packs_in_stated_order(spark, docs):
    # longest-first: __ord = -n_tokens, so next-fit sees a descending
    # length stream (FFD-style); all invariants must still hold
    pre = docs.withColumn(
        "nt", F.size(F.split(F.trim("text"), r"\s+"))
    ).withColumn("neg", -F.col("nt"))
    out = pack_documents(
        pre, 256, tokens_col="nt", n_shards=8, order_col="neg"
    ).localCheckpoint()
    assert out.count() == docs.count()
    over = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .where(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    # within a pack, offsets must follow DESCENDING token counts —
    # the stated order, not id order
    from pyspark.sql.window import Window

    w = Window.partitionBy("pack_id").orderBy("offset")
    bad = (
        out.withColumn("prev", F.lag("n_tokens").over(w))
        .where(F.col("prev").isNotNull() & (F.col("prev") < F.col("n_tokens")))
        .count()
    )
    assert bad == 0
    # deterministic under repartitioning
    again = pack_documents(
        pre.repartition(11), 256, tokens_col="nt", n_shards=8,
        order_col="neg",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
