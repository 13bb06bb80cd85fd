"""Degenerate-corpus protection for the LSH paths.

Raising num_planes cannot split a bucket of bit-identical signatures:
thousands of copies of one vector land in ONE (table, sig) bucket at
any plane count, turning the bucket equi-join quadratic. Two guards:

- lsh_bucket_topk caps the corpus side of each bucket (max_bucket),
  keeping the lowest neighbor_ids — exactly the tie-break winners for
  a degenerate bucket, so degenerate top-k survives the cap intact.
- embedding_near_duplicates collapses bit-identical vectors to one
  representative before hashing; the quadratic intra-group pair set is
  emitted by explode expansion, never by a join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.dedup import embedding_near_duplicates
from etlhelper_spark.functions.similarity import lsh_bucket_topk

DIM = 16


def _degenerate_corpus(spark, n_copies: int, n_normal: int = 50):
    """n_copies bit-identical vectors (ids 0..n_copies-1) plus
    n_normal distinct vectors (ids n_copies..)."""
    const = [1.0] + [0.0] * (DIM - 1)
    rows = [(i, const) for i in range(n_copies)]
    rows += [
        (n_copies + j, [float((j * 31 + d * 7) % 13 - 6) for d in range(DIM)])
        for j in range(n_normal)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_capped_topk_completes_on_10k_identical(spark):
    """10k identical vectors: the capped bucket join must complete
    quickly AND return the exact tie-break winners (lowest ids)."""
    corpus = _degenerate_corpus(spark, 10_000, n_normal=0)
    q = corpus.where(F.col("vec_id") == 0)
    res = lsh_bucket_topk(
        q, corpus, k=5, num_planes=4, dim=DIM, max_bucket=64
    ).collect()
    # all sims are 1.0, ties break neighbor_id asc -> 1..5 exactly
    assert [r.neighbor_id for r in sorted(res, key=lambda r: r.rank)] == [
        1,
        2,
        3,
        4,
        5,
    ]
    assert all(r.sim == 1.0 for r in res)


def test_cap_preserves_recall_gate(spark):
    """Capped recall on a mixed corpus (degenerate block + distinct
    vectors) must still clear the 0.8 recall gate the ANN queries pin
    in-plan: every query's true neighbors are either low-id ties
    (kept by the cap) or live in non-oversized buckets."""
    corpus = _degenerate_corpus(spark, 500, n_normal=40)
    queries = corpus.where(F.col("vec_id").isin([0, 1, 501, 502, 503]))
    capped = lsh_bucket_topk(
        queries, corpus, k=5, num_planes=2, dim=DIM, max_bucket=32
    )
    uncapped = lsh_bucket_topk(
        queries, corpus, k=5, num_planes=2, dim=DIM, max_bucket=None
    )
    truth = {
        (r.query_id, r.neighbor_id) for r in uncapped.collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in capped.collect()}
    assert len(got & truth) / len(truth) >= 0.8


def test_cap_adds_no_extra_exchange(spark):
    """The cap's window partitions by the bucket join's own key, so
    EnsureRequirements reuses the exchange: same shuffle count as the
    uncapped plan."""
    corpus = _degenerate_corpus(spark, 100, n_normal=20)
    q = corpus.where(F.col("vec_id") < 2)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    capped = lsh_bucket_topk(q, corpus, k=3, num_planes=4, dim=DIM, max_bucket=64)
    uncapped = lsh_bucket_topk(q, corpus, k=3, num_planes=4, dim=DIM, max_bucket=None)
    assert n_exchanges(capped) == n_exchanges(uncapped)


def test_neardup_collapse_handles_identical_block(spark):
    """2k identical vectors: the pair set is inherently quadratic
    (C(2000,2) true pairs) but must be produced by expansion, with the
    LSH join seeing ONE representative row for the whole block."""
    n = 2_000
    corpus = _degenerate_corpus(spark, n, n_normal=20)
    pairs = embedding_near_duplicates(
        corpus, "vec_id", "embedding", 0.95, method="lsh", num_planes=6,
        dim=DIM,
    )
    assert pairs.where(
        (F.col("id_a") < n) & (F.col("id_b") < n)
    ).count() == n * (n - 1) // 2


def test_neardup_lsh_equals_brute_with_duplicate_groups(spark):
    """Mixed corpus with duplicate groups of size 2 and 3: collapsed
    LSH must equal brute force exactly (identical vectors collide in
    every table, so recall on exact-dup groups is 1.0)."""
    base = _degenerate_corpus(spark, 0, n_normal=30)
    dup2 = base.where(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    dup3 = base.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 2000).alias("vec_id"), "embedding"
    )
    corpus = base.unionAll(dup2).unionAll(dup3)
    lsh = embedding_near_duplicates(
        corpus, "vec_id", "embedding", 0.95, method="lsh", num_planes=8,
        num_tables=8, dim=DIM,
    )
    brute = embedding_near_duplicates(
        corpus, "vec_id", "embedding", 0.95, method="brute"
    )
    assert sorted(map(tuple, lsh.collect())) == sorted(
        map(tuple, brute.collect())
    )
