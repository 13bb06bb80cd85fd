"""Product quantization (functions/pq.py): encode determinism,
reconstruction quality of ADC ranking, and degenerate handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.pq import (
    pq_adc_topk,
    pq_codebook_df,
    pq_encode,
    pq_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_train_deterministic_across_partitionings(spark):
    e = _emb(spark)
    b1 = pq_train(e.repartition(2), m_sub=4, k_codes=8, iterations=2)
    b2 = pq_train(e.repartition(32), m_sub=4, k_codes=8, iterations=2)
    assert b1 == b2
    assert set(b1) == {0, 1, 2, 3}
    for j in b1:
        assert all(len(c) == 16 for _code, c in b1[j])


def test_encode_codes_are_nearest_centroids(spark):
    """Every emitted code must be the argmax-cosine centroid of its
    subvector (ties low-code) — checked against numpy."""
    e = _emb(spark).where("vec_id < 100")
    books = pq_train(_emb(spark), m_sub=4, k_codes=8, iterations=2)
    enc = {r["id"]: r["codes"] for r in pq_encode(e, books).collect()}
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in e.collect()}
    for vid, v in rows.items():
        for j in range(4):
            sv = v[j * 16:(j + 1) * 16]
            best, best_s = None, -2.0
            for code, cent in books[j]:
                c = np.array(cent)
                denom = np.linalg.norm(sv) * np.linalg.norm(c)
                s = float(sv @ c / denom) if denom else -1.0
                if s > best_s + 1e-12:
                    best, best_s = code, s
            assert enc[vid][j] == best, (vid, j)


def test_adc_approximates_exact_cosine_ranking(spark):
    """ADC's top-1 for each query must be the query itself (a vector's
    own codes maximize the quantized dot — rank-1 self-retrieval is
    the standard PQ sanity gate), and the ADC top-5 must retain
    meaningful overlap with the exact cosine top-5. The synthetic
    corpus is near-isotropic, so beyond the self-match the exact
    neighbors sit at noise-level cosine margins — the overlap bar is
    set to what lossy 16x compression can honestly keep there, with
    the planted-duplicate test below pinning the strong-signal case."""
    e = _emb(spark)
    books = pq_train(e, m_sub=4, k_codes=8, iterations=2)
    enc = pq_encode(e, books)
    queries = e.where("vec_id < 10")
    got = pq_adc_topk(enc, books, queries, k=5)
    rows_out = got.collect()
    by_q = {}
    for r in rows_out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == set(range(10))
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in e.collect()}
    M = np.vstack([rows[i] for i in sorted(rows)])
    ids = np.array(sorted(rows))
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    overlap = 0
    for qid, neigh in by_q.items():
        assert len(neigh) == 5
        assert neigh[0] == qid  # rank-1 self-retrieval
        sims = Mn @ Mn[list(ids).index(qid)]
        top5 = set(ids[np.argsort(-sims)[:5]].tolist())
        overlap += len(top5 & set(neigh))
    assert overlap >= 12, overlap
    # and the ADC result is partitioning-independent
    again = pq_adc_topk(
        enc.repartition(32), books, queries.repartition(3), k=5
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows_out))


def test_adc_finds_planted_duplicate(spark):
    """A strong signal (an exact copy of a query vector under a new
    id) must be retrieved at full ADC similarity — identical vectors
    share every code, so their ADC scores are equal by construction."""
    e = _emb(spark)
    copy = e.where("vec_id = 3").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = e.unionByName(copy)
    books = pq_train(e, m_sub=4, k_codes=8, iterations=2)
    enc = pq_encode(corpus, books)
    got = pq_adc_topk(enc, books, e.where("vec_id = 3"), k=2).collect()
    assert sorted(r["neighbor_id"] for r in got) == [3, 100003]
    assert got[0]["adc_sim"] == got[1]["adc_sim"]


def test_indivisible_dim_rejected(spark):
    e = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(e, m_sub=7)


def test_codebook_df_shape(spark):
    books = pq_train(_emb(spark), m_sub=4, k_codes=8, iterations=2)
    cb = pq_codebook_df(spark, books)
    assert cb.columns == ["sub", "code", "centroid"]
    assert cb.count() == sum(len(v) for v in books.values())


def test_pq_index_roundtrip_and_frozen_append(spark, tmp_path):
    """build → load roundtrips the codebooks exactly; appending batch
    2 against frozen codebooks equals encoding the union with the
    same books (content-identity, the q180 contract for PQ)."""
    import pyspark.sql.functions as F

    from etlhelper_spark.functions.pq import (
        append_pq_codes,
        build_pq_index,
        load_pq_codebooks,
        read_pq_codes,
    )

    e = _emb(spark)
    b0 = e.where(F.pmod("vec_id", F.lit(2)) == 0)
    b1 = e.where(F.pmod("vec_id", F.lit(2)) == 1)
    path = str(tmp_path / "pqidx")
    n0 = build_pq_index(b0, path, m_sub=4, k_codes=8, iterations=2)
    books = load_pq_codebooks(spark, path)
    assert books == pq_train(b0, m_sub=4, k_codes=8, iterations=2)
    n1 = append_pq_codes(b1, path)
    assert n0 + n1 == e.count()
    got = {r["id"]: list(r["codes"]) for r in read_pq_codes(spark, path).collect()}
    want = {r["id"]: list(r["codes"]) for r in pq_encode(e, books).collect()}
    assert got == want
