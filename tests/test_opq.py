"""OPQ rotation (functions/opq.py): orthogonality, determinism,
rotation-apply correctness, error paths, and the recall improvement
the rotation exists for (anisotropic corpus, identical PQ budgets)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etlhelper_spark.functions.opq import (
    opq_train_rotation,
    rotate_embeddings,
)

D = 16


@pytest.fixture(scope="module")
def aniso(spark):
    """120 vectors with variance crammed into the first 4 dims —
    position-split PQ's worst case."""
    rng = np.random.RandomState(7)
    X = rng.randn(120, D)
    X[:, :4] *= 8.0
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in X[i]])
        for i in range(len(X))
    ]
    return spark.createDataFrame(rows).localCheckpoint()


def test_rotation_is_orthogonal_and_deterministic(aniso):
    R1 = opq_train_rotation(
        aniso, m_sub=4, k_codes=8, opq_iters=3, sample_n=200
    )
    R2 = opq_train_rotation(
        aniso, m_sub=4, k_codes=8, opq_iters=3, sample_n=200
    )
    assert R1 == R2  # pure function of (data, parameters)
    R = np.array(R1)
    assert R.shape == (D, D)
    assert np.allclose(R @ R.T, np.eye(D), atol=1e-9)


def test_rotation_deterministic_across_partitionings(aniso):
    R1 = opq_train_rotation(aniso, m_sub=4, k_codes=8, opq_iters=2)
    R2 = opq_train_rotation(
        aniso.repartition(11), m_sub=4, k_codes=8, opq_iters=2
    )
    assert R1 == R2  # sample is orderBy(id).limit — partition-proof


def test_rotate_embeddings_matches_numpy_and_preserves_norms(aniso):
    R = opq_train_rotation(aniso, m_sub=4, k_codes=8, opq_iters=2)
    out = rotate_embeddings(aniso, R).orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in out])
    Y = np.array([r["rotated"] for r in out])
    assert np.allclose(Y, X @ np.array(R), atol=1e-12)
    # orthogonal rotation preserves L2 norms (and hence cosine truth)
    assert np.allclose(
        np.linalg.norm(Y, axis=1), np.linalg.norm(X, axis=1), atol=1e-9
    )


def test_opq_improves_pq_reconstruction(aniso):
    """The training objective itself: rotated-space PQ reconstruction
    error must beat raw-space at the same (m, k) budget."""
    from etlhelper_spark.functions.pq import pq_encode, pq_train

    def recon_err(df):
        books = pq_train(df, m_sub=4, k_codes=8, iterations=3)
        enc = pq_encode(df, books)
        X = np.array(
            [r["embedding"] for r in df.orderBy("vec_id").collect()]
        )
        codes = {
            r["id"]: r["codes"]
            for r in enc.orderBy("id").collect()
        }
        sd = X.shape[1] // 4
        err = 0.0
        for i, vid in enumerate(sorted(codes)):
            for s in range(4):
                cent = dict(books[s])[codes[vid][s]]
                err += float(
                    np.sum(
                        (X[i, s * sd : (s + 1) * sd] - np.array(cent))
                        ** 2
                    )
                )
        return err

    R = opq_train_rotation(
        aniso, m_sub=4, k_codes=8, opq_iters=4, sample_n=200
    )
    rotated = rotate_embeddings(aniso, R).select(
        "vec_id", F.col("rotated").alias("embedding")
    ).localCheckpoint()
    # On 120 isotropic-gaussian-plus-scale rows with the engine's
    # spherical 2-round PQ the gain is modest but deterministic
    # (measured 0.919x; the recall-level 2.2x gain on real embeddings
    # is gated in q248). Everything is seeded, so the margin is exact.
    assert recon_err(rotated) < 0.95 * recon_err(aniso)


def test_error_paths(spark, aniso):
    with pytest.raises(ValueError, match="not divisible"):
        opq_train_rotation(aniso, m_sub=5)
    with pytest.raises(ValueError, match="empty"):
        opq_train_rotation(aniso.where(F.col("vec_id") < 0))
    with pytest.raises(ValueError, match="square"):
        rotate_embeddings(aniso, [[1.0, 0.0]])
    bad = [[0.0] * (D + 2)] * (D + 2)
    with pytest.raises(Exception, match="dim"):
        rotate_embeddings(aniso, bad).collect()
