"""Pins the d-agnostic Mahalanobis kernel (eigen pseudo-inverse,
functions/similarity.py::mahalanobis_scores) against q178's
oracle-verified cofactor-inverse path at d=4 — the generic kernel and
the literal path must agree to float tolerance on the same corpus.
"""

from __future__ import annotations

import numpy as np

from etlhelper_spark.plans.queries import q178_mahalanobis_d4

SF_DIR = "/root/testdata/sf0.001"


def test_generic_kernel_matches_cofactor_path_d4(spark):
    from etlhelper_spark.functions.similarity import mahalanobis_scores

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r["vec_id"]: r["md2"]
        for r in mahalanobis_scores(e, "embedding", dims=[1, 2, 3, 4])
        .select("vec_id", "md2")
        .collect()
    }
    # q178: top-20 by the shared-formula cofactor inverse, rounded 4dp
    want = {
        r["vec_id"]: r["md2"]
        for r in q178_mahalanobis_d4(spark, SF_DIR).collect()
    }
    assert len(want) == 20
    for vid, ref in want.items():
        assert abs(got[vid] - ref) < 1e-3, (vid, got[vid], ref)
    # and the kernel ranks the same top outlier
    top_kernel = max(got, key=lambda v: (got[v], -v))
    top_oracle = max(want, key=lambda v: (want[v], -v))
    assert top_kernel == top_oracle


def test_corpus_moments_match_plain_aggregates(spark):
    """_corpus_moments' Σx/n means and Gram-derived covariance must
    equal the straightforward per-dimension aggregates."""
    from etlhelper_spark.functions.similarity import _corpus_moments

    rng = np.random.RandomState(7)
    X = np.round(rng.randn(500, 3), 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(500)],
        ["vec_id", "embedding"],
    ).repartition(4)
    pos, n, mu, S = _corpus_moments(df, "embedding", None, round_means=False)
    assert pos == [1, 2, 3] and n == 500
    assert np.abs(mu - X.mean(axis=0)).max() < 1e-9
    ref = np.cov(X, rowvar=False, ddof=1)
    assert np.abs(S - ref).max() < 2e-6  # S is 6dp-rounded


def test_corpus_moments_unsorted_dims(spark):
    """Means must align with sorted-pos order even when the caller
    passes dims out of order: dims=[3,1] and dims=[1,3] describe the
    same projection, so moments — and everything downstream
    (whitening, Mahalanobis) — must be identical."""
    from etlhelper_spark.functions.similarity import (
        _corpus_moments,
        mahalanobis_scores,
        whiten_embeddings,
    )

    rng = np.random.RandomState(11)
    X = np.round(rng.randn(300, 4) * [1.0, 2.0, 0.5, 3.0] + [5, -2, 0, 9], 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        ["vec_id", "embedding"],
    ).repartition(4)
    pos_a, n_a, mu_a, S_a = _corpus_moments(
        df, "embedding", [1, 3], round_means=False
    )
    pos_b, n_b, mu_b, S_b = _corpus_moments(
        df, "embedding", [3, 1], round_means=False
    )
    assert pos_a == pos_b == [1, 3] and n_a == n_b == 300
    assert np.abs(mu_a - mu_b).max() == 0.0
    assert np.abs(S_a - S_b).max() == 0.0
    # mu is keyed by sorted dim label: mu[0] is dim 1's mean
    assert abs(mu_b[0] - X[:, 0].mean()) < 1e-9
    assert abs(mu_b[1] - X[:, 2].mean()) < 1e-9
    # downstream consumers agree between the two orderings
    w_a = {r["vec_id"]: r["whitened"] for r in whiten_embeddings(
        df, "embedding", dims=[1, 3]).collect()}
    w_b = {r["vec_id"]: r["whitened"] for r in whiten_embeddings(
        df, "embedding", dims=[3, 1]).collect()}
    for vid, va in w_a.items():
        assert np.abs(np.array(va) - np.array(w_b[vid])).max() < 1e-12
    # whitened output is actually centered (the bug subtracted dim-3's
    # mean from dim-1's values, leaving a visible offset)
    W = np.array([w_b[i] for i in range(300)])
    assert np.abs(W.mean(axis=0)).max() < 1e-6
    m_a = {r["vec_id"]: r["md2"] for r in mahalanobis_scores(
        df, "embedding", dims=[1, 3]).select("vec_id", "md2").collect()}
    m_b = {r["vec_id"]: r["md2"] for r in mahalanobis_scores(
        df, "embedding", dims=[3, 1]).select("vec_id", "md2").collect()}
    assert m_a == m_b
