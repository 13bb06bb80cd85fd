"""Scale-safety of semantic_dedup (SemDeDup, functions/dedup.py).

Round-3 verdict: a fixed k with no cluster-size cap makes the
within-cluster pairwise stage quadratic — a skewed clustering (or a
near-duplicate-heavy corpus) can put most of the corpus in ONE
cluster, the exact degenerate-bucket hazard lsh_bucket_topk's
max_bucket guards against. Round-4 contract under test:

- k derives from corpus size (expected cluster size fixed as n grows);
- max_cluster re-shards an oversized cluster into deterministic
  salted sub-shards, bounding every task's pairwise work;
- the Arrow-batched numpy pairwise kernel returns the same survivor
  set (same 4dp-rounded sims) as a plain quadratic reference;
- a zero-norm embedding scores -1.0 (cosine_similarity's
  try_divide/coalesce contract) instead of aborting the job under
  ANSI mode (round-3 ADVICE).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.dedup import semantic_dedup

DIM = 8


def _vec(seed: int) -> list[float]:
    return [float((seed * 31 + d * 7) % 13 - 6) for d in range(DIM)]


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _quadratic_reference(rows, threshold):
    """All-pairs cosine at 4dp, pure Python — the oracle the bounded
    plan must match when every row shares one cluster."""
    from decimal import ROUND_HALF_UP, Decimal

    def r4(x: float) -> float:
        d = Decimal(x).quantize(Decimal("1e-10"), ROUND_HALF_UP)
        return float(d.quantize(Decimal("1e-4"), ROUND_HALF_UP))

    out = set()
    for i, (ida, va) in enumerate(rows):
        for idb, vb in rows[i + 1 :]:
            dot = 0.0
            for x, y in zip(va, vb):
                dot += x * y
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(y * y for y in vb))
            sim = dot / (na * nb) if na * nb else -1.0
            if r4(sim) >= threshold:
                out.add((min(ida, idb), max(ida, idb), r4(sim)))
    return out


def test_matches_quadratic_reference_single_cluster(spark):
    """With one cluster and no cap in play, the bounded plan must be
    EXHAUSTIVE and EXACT: same pairs, same 4dp sims as brute force."""
    rows = [(i, _vec(i)) for i in range(40)]
    df = _corpus(spark, rows)
    one_cluster = df.select(
        F.col("vec_id").alias("id"), F.lit(0).alias("cluster_id")
    )
    got = {
        (r.id_a, r.id_b, r.sim)
        for r in semantic_dedup(
            df, threshold=0.5, assignments=one_cluster, max_cluster=None
        ).collect()
    }
    want = _quadratic_reference(rows, 0.5)
    assert got == want
    assert want  # the fixture must actually produce survivors


def test_planted_degenerate_cluster_is_resharded(spark):
    """10k near-identical vectors all assigned to one cluster: the cap
    must split the pairwise work into ceil(c/max_cluster) sub-shards —
    no task sees a quadratic group — while near-duplicate pairs keep
    surfacing (identical vectors pair up inside every shard)."""
    n = 10_000
    base = [1.0] + [0.0] * (DIM - 1)
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in base]).alias("embedding"),
    )
    planted = df.select(
        F.col("vec_id").alias("id"), F.lit(0).alias("cluster_id")
    )
    pairs = semantic_dedup(
        df, threshold=0.9, assignments=planted, max_cluster=512
    )
    # work bound: 20 shards of ~500 rows -> ~2.5M compares, not 50M.
    # The shard partitioning is internal; prove the bound by the pair
    # count: an uncapped run emits C(10k,2) ~ 50M pairs, a capped one
    # at most sum C(c_i,2) with c_i ~ 500 -> ~2.5M.
    n_pairs = pairs.count()
    assert 0 < n_pairs < 10_000_000
    # identical vectors: every surviving pair has sim == 1.0
    assert pairs.where(F.col("sim") != 1.0).count() == 0


def test_cap_leaves_small_clusters_exhaustive(spark):
    """A corpus with an oversized cluster AND a small one: the small
    cluster's pair set must be untouched by the cap."""
    rows = [(i, _vec(7)) for i in range(600)]  # near-identical block
    rows += [(1000 + j, _vec(j)) for j in range(30)]  # distinct block
    df = _corpus(spark, rows)
    assigned = df.select(
        F.col("vec_id").alias("id"),
        F.when(F.col("vec_id") < 1000, 0).otherwise(1).alias("cluster_id"),
    )
    capped = semantic_dedup(
        df, threshold=0.5, assignments=assigned, max_cluster=128
    )
    uncapped = semantic_dedup(
        df, threshold=0.5, assignments=assigned, max_cluster=None
    )
    small_capped = {
        (r.id_a, r.id_b, r.sim)
        for r in capped.where(F.col("cluster_id") == 1).collect()
    }
    small_uncapped = {
        (r.id_a, r.id_b, r.sim)
        for r in uncapped.where(F.col("cluster_id") == 1).collect()
    }
    assert small_capped == small_uncapped


def test_derived_k_scales_with_corpus():
    """k = max(8, ceil(n / target_cluster_size)) — the derivation that
    keeps expected cluster size fixed as the corpus grows."""
    for n, target, want in [
        (500, 256, 8),
        (2000, 256, 8),
        (1_000_000, 256, 3907),
        (100, 256, 8),
    ]:
        assert max(8, math.ceil(n / target)) == want


def test_zero_norm_vector_does_not_abort(spark):
    """ANSI mode: a zero embedding in the corpus must score -1.0
    against everything (and thus drop below any >= 0 threshold), not
    raise DIVIDE_BY_ZERO — round-3 ADVICE reproduction."""
    rows = [(0, [0.0] * DIM), (1, _vec(3)), (2, _vec(3))]
    df = _corpus(spark, rows)
    one_cluster = df.select(
        F.col("vec_id").alias("id"), F.lit(0).alias("cluster_id")
    )
    got = semantic_dedup(
        df, threshold=0.5, assignments=one_cluster
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}
    # and with a threshold that admits -1.0, the zero-vector pairs
    # surface with exactly the cosine_similarity contract value
    low = semantic_dedup(
        df, threshold=-1.0, assignments=one_cluster
    ).collect()
    zero_sims = {r.sim for r in low if r.id_a == 0}
    assert zero_sims == {-1.0}


def test_large_k_assignment_path(spark):
    """kmeans_assignments past literal_max must switch to the
    Arrow-batched argmax and still assign every row deterministically
    to a valid seed id."""
    from etlhelper_spark.functions.clustering import kmeans_assignments

    rows = [(i, _vec(i)) for i in range(300)]
    df = _corpus(spark, rows)
    out = kmeans_assignments(
        df, "vec_id", "embedding", k=80, iterations=1, literal_max=16
    )
    got = out.collect()
    assert len(got) == 300
    assert all(0 <= r.cluster_id < 80 for r in got)
    # determinism: second run identical
    again = kmeans_assignments(
        df, "vec_id", "embedding", k=80, iterations=1, literal_max=16
    ).collect()
    assert {(r.id, r.cluster_id) for r in got} == {
        (r.id, r.cluster_id) for r in again
    }


def test_literal_and_batched_paths_agree(spark):
    """Same corpus, same k: the codegen literal argmax and the numpy
    batched argmax must produce the same assignment (shared tie
    order, shared centroid rounding)."""
    from etlhelper_spark.functions.clustering import kmeans_assignments

    rows = [(i, _vec(i)) for i in range(120)]
    df = _corpus(spark, rows)
    lit = kmeans_assignments(
        df, "vec_id", "embedding", k=12, iterations=2, literal_max=64
    ).collect()
    bat = kmeans_assignments(
        df, "vec_id", "embedding", k=12, iterations=2, literal_max=1
    ).collect()
    assert {(r.id, r.cluster_id) for r in lit} == {
        (r.id, r.cluster_id) for r in bat
    }


def test_q152_plan_shape(spark):
    """Physical-plan contract of the rebuilt pairwise stage: exactly
    one Python stage (the per-(cluster, shard) matmul kernel), its
    input grouped by ONE hash exchange on (cluster_id, shard), the
    cluster-size cap joined back as a broadcast, and no nested-loop
    or cartesian fallback anywhere."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        semantic_dedup(df, "vec_id", "embedding", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    assert re.search(
        r"Exchange hashpartitioning\(cluster_id#\d+L?, shard#\d+", plan
    )


def test_randomized_corpus_matches_reference_per_cluster(spark):
    """Seeded random corpus — negative components, exact duplicates,
    zero vectors, uneven clusters — uncapped plan must equal the
    quadratic reference within every cluster."""
    import numpy as np

    rng = np.random.RandomState(0)
    rows = []
    for i in range(150):
        if i % 29 == 0:
            v = [0.0] * DIM  # zero vectors sprinkled in
        elif i % 7 == 0:
            v = [float(x) for x in rng.randint(-5, 6, DIM)]
            rows.append((1000 + i, v))  # exact duplicate pair
        else:
            v = [float(np.round(x, 3)) for x in rng.randn(DIM)]
        rows.append((i, v))
    df = _corpus(spark, rows)
    assigned = df.select(
        F.col("vec_id").alias("id"),
        F.pmod("vec_id", F.lit(3)).alias("cluster_id"),
    )
    got = {}
    for r in semantic_dedup(
        df, threshold=0.2, assignments=assigned, max_cluster=None
    ).collect():
        got.setdefault(r.cluster_id, set()).add((r.id_a, r.id_b, r.sim))
    want = {}
    by_cluster: dict = {}
    for ident, v in rows:
        by_cluster.setdefault(ident % 3, []).append((ident, v))
    for cid, members in by_cluster.items():
        ref = _quadratic_reference(members, 0.2)
        if ref:
            want[cid] = ref
    assert got == want


def test_singleton_and_empty_clusters(spark):
    """Clusters with one member must contribute no pairs and not
    trip the empty-frame Arrow conversion in the pandas kernel."""
    rows = [(0, _vec(1)), (1, _vec(2)), (2, _vec(2)), (3, _vec(9))]
    df = _corpus(spark, rows)
    assigned = spark.createDataFrame(
        [(0, 10), (1, 11), (2, 11), (3, 12)], ["id", "cluster_id"]
    )
    got = semantic_dedup(
        df, threshold=-1.0, assignments=assigned
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_embedding_covariance_matches_numpy(spark):
    """Gram-partial covariance must equal numpy's two-pass reference
    at the 6dp contract, for a multi-partition input, and feed a valid
    driver-side whitening step (eigenvalues of a covariance are
    non-negative)."""
    import numpy as np

    from etlhelper_spark.functions.similarity import embedding_covariance

    rng = np.random.RandomState(7)
    X = np.round(rng.randn(500, 6), 3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(500)],
        ["vec_id", "embedding"],
    ).repartition(8)
    got = {
        (r.i, r.j): (r.n, r.cov)
        for r in embedding_covariance(df, "embedding").collect()
    }
    ref = np.cov(X, rowvar=False, ddof=1)
    assert len(got) == 21  # upper triangle of 6x6
    M = np.zeros((6, 6))
    for (i, j), (n, cov) in got.items():
        assert n == 500
        assert abs(cov - ref[i - 1, j - 1]) < 1e-6
        M[i - 1, j - 1] = M[j - 1, i - 1] = cov
    # bounded-driver PCA/whitening step on the collected matrix
    w, _ = np.linalg.eigh(M)
    assert (w > -1e-9).all()


def test_embedding_covariance_dims_subset_and_degenerate(spark):
    """dims selects 1-based positions; a single-row corpus yields NULL
    covariance (covar_samp contract) instead of an ANSI abort."""
    from etlhelper_spark.functions.similarity import embedding_covariance

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [2.0, 4.0, 7.0])],
        ["vec_id", "embedding"],
    )
    got = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df, "embedding", dims=[1, 3]).collect()
    }
    assert got == {(1, 1): 0.5, (1, 3): 2.0, (3, 3): 8.0}

    one = spark.createDataFrame([(0, [1.0, 2.0])], ["vec_id", "embedding"])
    rows = embedding_covariance(one, "embedding").collect()
    assert all(r.cov is None for r in rows)


def test_whiten_embeddings_identity_covariance(spark):
    """Whitened output must have ~identity covariance on the spanned
    subspace (the operator's whole contract)."""
    import numpy as np

    from etlhelper_spark.functions.similarity import whiten_embeddings

    rng = np.random.RandomState(3)
    A = rng.randn(4, 4)
    X = rng.randn(400, 4) @ A  # correlated dims
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(400)],
        ["vec_id", "embedding"],
    ).repartition(4)
    out = whiten_embeddings(df, "embedding")
    Y = np.vstack(
        [r.whitened for r in out.orderBy("vec_id").collect()]
    )
    C = np.cov(Y, rowvar=False, ddof=1)
    assert np.abs(C - np.eye(4)).max() < 0.05


def test_mahalanobis_generic_matches_closed_form_2d(spark):
    """The generic eigen-inverse kernel must agree with q174's 2-dim
    closed form to float tolerance on the same corpus."""
    import numpy as np

    from etlhelper_spark.functions.similarity import (
        embedding_covariance,
        mahalanobis_scores,
    )

    rng = np.random.RandomState(11)
    X = np.round(rng.randn(300, 2) @ np.array([[2.0, 0.5], [0.5, 1.0]]), 3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        ["vec_id", "embedding"],
    ).repartition(4)
    got = {
        r.vec_id: r.md2
        for r in mahalanobis_scores(df, "embedding").collect()
    }
    cov = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(df, "embedding").collect()
    }
    S = np.array(
        [[cov[(1, 1)], cov[(1, 2)]], [cov[(1, 2)], cov[(2, 2)]]]
    )
    mu = np.round(X.mean(axis=0), 6)
    Pm = np.linalg.inv(S)
    for i in range(0, 300, 37):
        d = X[i] - mu
        ref = float(d @ Pm @ d)
        assert abs(got[i] - ref) < 1e-6


def test_whiten_embeddings_rank_deficient_corpus(spark):
    """A constant dimension (zero variance) must not explode: the eps
    eigenvalue floor whitens the spanned subspace and leaves the
    degenerate direction bounded."""
    import numpy as np

    from etlhelper_spark.functions.similarity import whiten_embeddings

    rng = np.random.RandomState(5)
    X = np.column_stack(
        [rng.randn(200), np.full(200, 3.25), rng.randn(200)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        ["vec_id", "embedding"],
    )
    out = whiten_embeddings(df, "embedding", eps=1e-6)
    Y = np.vstack([r.whitened for r in out.collect()])
    assert np.isfinite(Y).all()
    # constant dim centers to ~0 and stays ~0 after whitening
    assert np.abs(Y[:, 1]).max() < 1e-2
    C = np.cov(Y, rowvar=False, ddof=1)
    # live dims whiten to ~unit variance
    assert abs(C[0, 0] - 1) < 0.1 and abs(C[2, 2] - 1) < 0.1
