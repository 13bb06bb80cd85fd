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
