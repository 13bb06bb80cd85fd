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


def test_cap_adds_bounded_extra_exchanges(spark):
    """The cap's window partitions by the bucket join's own key (that
    exchange is reused); the survival-aware dedup adds at most two
    LIGHT exchanges — the per-neighbor alive_tbls aggregate and its
    join — both over (id, small-array) rows, never vector payloads.
    Bounded here so a regression can't silently grow the plan."""
    corpus = _degenerate_corpus(spark, 100, n_normal=20)
    q = corpus.where(F.col("vec_id") < 2)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    capped = lsh_bucket_topk(q, corpus, k=3, num_planes=4, dim=DIM, max_bucket=64)
    uncapped = lsh_bucket_topk(q, corpus, k=3, num_planes=4, dim=DIM, max_bucket=None)
    assert n_exchanges(capped) <= n_exchanges(uncapped) + 3


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


def test_capped_topk_matches_python_reference(spark):
    """Survival-aware dedup: with aggressive caps and several tables,
    the candidate set must equal the reference semantics — a neighbor
    is a candidate iff it SURVIVES the cap in at least one table whose
    bucket contains the query (finding: a neighbor capped out of its
    earliest colliding bucket but alive in a later one must still be
    reported)."""
    import random

    import numpy as np

    from etlhelper_spark.functions.similarity import (
        _plane_matrix,
        lsh_bucket_topk,
    )

    rng = random.Random(17)
    dim, planes, tables, cap, k = 4, 2, 3, 2, 5
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 5")

    # reference: signatures -> capped buckets -> union candidates
    pm = _plane_matrix(tables * planes, dim)
    def sigs(v):
        bits = (np.array(v) @ pm.T >= 0).astype(int)
        return [
            "".join(str(b) for b in bits[t * planes : (t + 1) * planes])
            for t in range(tables)
        ]
    all_sigs = {i: sigs(v) for i, v in vecs}
    buckets: dict = {}
    for i, _ in vecs:
        for t, s in enumerate(all_sigs[i]):
            buckets.setdefault((t, s), []).append(i)
    alive = {}
    for (t, s), members in buckets.items():
        for i in sorted(members)[:cap]:
            alive.setdefault(i, set()).add(t)
    expect = {}
    for qid in range(5):
        cands = set()
        for t, s in enumerate(all_sigs[qid]):
            for i in sorted(buckets[(t, s)])[:cap]:
                if i != qid:
                    cands.add(i)
        def cos(a, b):
            a, b = np.array(a), np.array(b)
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        lookup = dict(vecs)
        ranked = sorted(
            cands, key=lambda i: (-cos(lookup[qid], lookup[i]), i)
        )[:k]
        expect[qid] = ranked

    got: dict = {}
    rows = lsh_bucket_topk(
        queries, df, k=k, num_planes=planes, num_tables=tables,
        dim=dim, max_bucket=cap,
    ).collect()
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == {q: v for q, v in expect.items() if v}
