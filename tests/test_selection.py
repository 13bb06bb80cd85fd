"""DSIR data selection and benchmark decontamination
(functions/selection.py): feature extraction, distribution smoothing,
exact-decimal weight accumulation, Gumbel top-k determinism, and the
contamination ratio contract (clean docs kept, short docs loud)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etlhelper_spark.functions.selection import (
    bucket_log_probs,
    contamination_report,
    dsir_log_weights,
    gumbel_topk,
    hashed_ngram_features,
)

B = 64


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the cat sat on the mat"),
        Row(doc_id=2, text="the dog sat on the log"),
        # 7 tokens = 6 bigrams, same evidence mass as doc 5 (DSIR
        # weights are doc-likelihood sums, so only equal-length docs
        # are order-comparable in tests)
        Row(doc_id=3, text="quantum flux capacitors hum loudly near reactors"),
        Row(doc_id=4, text="single"),  # 1 token: no bigrams
        Row(doc_id=5, text="the cat sat on the mat today"),
    ]
    return spark.createDataFrame(rows)


def test_features_count_and_short_doc_dropped(docs):
    f = hashed_ngram_features(docs, n=2, buckets=B)
    per_doc = {
        r["id"]: r["s"]
        for r in f.groupBy("id").agg(F.sum("cnt").alias("s")).collect()
    }
    # n-gram count = tokens - 1 for every doc with >= 2 tokens
    assert per_doc[1] == 5 and per_doc[2] == 5 and per_doc[3] == 6
    assert 4 not in per_doc  # 1-token doc carries no evidence
    assert f.where((F.col("bucket") < 0) | (F.col("bucket") >= B)).count() == 0


def test_bucket_log_probs_normalizes(spark, docs):
    f = hashed_ngram_features(docs, n=2, buckets=B)
    d = bucket_log_probs(f, B, alpha=1.0)
    assert d.count() == B  # every bucket, including empty ones
    total = sum(math.exp(r["logp"]) for r in d.collect())
    assert abs(total - 1.0) < 1e-9


def test_dsir_weights_prefer_target_like_docs(spark, docs):
    raw = hashed_ngram_features(docs, n=2, buckets=B)
    target = hashed_ngram_features(
        docs.where(F.col("doc_id") == 1), n=2, buckets=B
    )
    w = dsir_log_weights(
        raw,
        bucket_log_probs(target, B),
        bucket_log_probs(raw, B),
    )
    got = {r["id"]: r["weight"] for r in w.collect()}
    # doc 5 shares 5 of its 6 bigrams with the target doc 1;
    # doc 3 shares none — the weight order must reflect that
    assert got[1] > got[3] and got[5] > got[3]
    assert got[1] == max(got.values())
    assert 4 not in got  # no features -> no weight row


def test_dsir_weight_partition_invariance(spark, docs):
    raw = hashed_ngram_features(docs, n=2, buckets=B)
    t = bucket_log_probs(
        hashed_ngram_features(
            docs.where(F.col("doc_id") == 1), n=2, buckets=B
        ),
        B,
    )
    r = bucket_log_probs(raw, B)
    a = sorted(dsir_log_weights(raw, t, r).collect())
    b = sorted(
        dsir_log_weights(raw.repartition(7), t, r).collect()
    )
    assert a == b  # exact-decimal accumulate: bit-identical


def test_gumbel_topk_deterministic_and_ranked(spark, docs):
    raw = hashed_ngram_features(docs, n=2, buckets=B)
    w = dsir_log_weights(
        raw,
        bucket_log_probs(
            hashed_ngram_features(
                docs.where(F.col("doc_id") == 1), n=2, buckets=B
            ),
            B,
        ),
        bucket_log_probs(raw, B),
    )
    a = gumbel_topk(w, n=3, seed=13).collect()
    b = gumbel_topk(w, n=3, seed=13).collect()
    assert a == b
    assert [r["rank"] for r in a] == [1, 2, 3]
    keys = [r["key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # a different seed reshuffles the Gumbel noise
    c = gumbel_topk(w, n=3, seed=14).collect()
    assert {r["id"] for r in c} != set() and (
        [r["id"] for r in c] != [r["id"] for r in a]
        or [r["key"] for r in c] != keys
    )


def test_contamination_keeps_clean_and_short_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h"),  # == benchmark doc
            Row(doc_id=2, text="z y x w v u t s"),  # clean
            Row(doc_id=3, text="too short"),  # < n tokens
            Row(doc_id=4, text="a b c d e f g h i"),  # 2 grams, both hit
        ]
    )
    bench = docs.where(F.col("doc_id") == 1)
    rep = contamination_report(docs, bench, n=8, threshold=0.5)
    got = {r["id"]: r for r in rep.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["ratio"] == 1.0 and got[1]["contaminated"]
    assert got[2]["n_hit"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_grams"] == 0 and got[3]["ratio"] == 0.0
    assert got[4]["n_grams"] == 2 and got[4]["n_hit"] == 1
    assert got[4]["ratio"] == 0.5 and not got[4]["contaminated"]


def test_contamination_distinct_grams_resist_repetition(spark):
    # a doc repeating one leaked sentence cannot inflate n_hit
    leak = "a b c d e f g h"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=f"{leak} {leak} {leak}")]
    )
    bench = spark.createDataFrame([Row(doc_id=9, text=leak)])
    r = contamination_report(docs, bench, n=8).first()
    assert r["n_hit"] < r["n_grams"]  # bridging grams don't hit
    assert r["n_hit"] == 1  # the distinct leaked gram counts once
