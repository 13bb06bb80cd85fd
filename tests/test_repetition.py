"""Repetition metrics + Gopher flags (functions/text.py::
repetition_stats / gopher_flags): hand-computed masses, tie-break
determinism, short-doc zeros, strict-inequality thresholds,
partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.text import gopher_flags, repetition_stats


@pytest.fixture(scope="module")
def stats_rows(spark):
    # doc 1: "a b a b a b" -> 2-grams: "a b" x3, "b a" x2;
    #   3-grams: "a b a" x2, "b a b" x2 (all duplicated)
    # doc 2: "x y z w" -> all grams unique
    # doc 3: "t" -> shorter than both gram sizes
    # doc 4: "" -> empty text (one empty token)
    # doc 5: "p q p r" -> 2-grams "p q","q p","p r" all unique;
    #   tie on count=1 -> lexicographically greatest wins ("q p")
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "x y z w"),
            (3, "t"),
            (4, ""),
            (5, "p q p r"),
        ],
        "doc_id long, text string",
    )
    return {
        r["doc_id"]: r for r in repetition_stats(df).collect()
    }


def test_hand_computed_masses(stats_rows):
    r = stats_rows[1]
    assert r["n_tokens"] == 6
    assert r["total_chars"] == 11
    assert r["top_ngram"] == "a b"
    assert r["top_ngram_count"] == 3
    assert r["top_ngram_chars"] == 9  # 3 occurrences x len("a b")
    # duplicated 3-grams: "a b a" x2 + "b a b" x2, len 5 each
    assert r["dup_ngram_count"] == 2
    assert r["dup_ngram_chars"] == 20


def test_unique_grams_and_tiebreak(stats_rows):
    r = stats_rows[2]
    assert r["top_ngram_count"] == 1
    assert r["dup_ngram_count"] == 0 and r["dup_ngram_chars"] == 0
    # count ties break to the lexicographically greatest gram -> a
    # unique deterministic winner
    assert stats_rows[2]["top_ngram"] == "z w"
    assert stats_rows[5]["top_ngram"] == "q p"


def test_short_and_empty_docs_score_zero(stats_rows):
    for doc in (3, 4):
        r = stats_rows[doc]
        assert r["n_tokens"] == 1
        assert r["top_ngram"] == ""
        assert r["top_ngram_count"] == 0
        assert r["top_ngram_chars"] == 0
        assert r["dup_ngram_count"] == 0
        assert r["dup_ngram_chars"] == 0


def test_flags_strict_inequality_and_keep(spark):
    # doc 1: top_ngram_chars=9, total=11 chars: 9*5 > 11*1 -> flagged
    # at 20%; exactly-at-threshold is NOT flagged (strict >): doc 6
    # is "c c" -> top gram "c c" count 1, chars 3, total 3;
    # 3*1 > 3*1 is false at 100% threshold
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (6, "c c")],
        "doc_id long, text string",
    )
    stats = repetition_stats(df)
    at20 = {
        r["doc_id"]: r
        for r in gopher_flags(
            stats,
            min_tokens=1,
            max_tokens=100,
            max_top_frac="0.2",
            max_dup_frac="1",
        ).collect()
    }
    assert at20[1]["flag_top_ngram"] is True
    assert at20[1]["keep"] is False
    # exactly-at-threshold is NOT flagged (strict >): doc 6 is "c c"
    # -> top gram "c c" x1, chars 3 of 3 total; 3*1 > 3*1 is false
    # at the 100% threshold
    at100 = {
        r["doc_id"]: r
        for r in gopher_flags(
            stats,
            min_tokens=1,
            max_tokens=100,
            max_top_frac="1",
            max_dup_frac="1",
        ).collect()
    }
    assert at100[6]["flag_top_ngram"] is False
    assert at100[6]["keep"] is True


def test_token_bounds_flags(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_flags(
            repetition_stats(df),
            min_tokens=4,
            max_tokens=5,
            max_top_frac="1",
            max_dup_frac="1",
        ).collect()
    }
    assert out[1]["flag_short"] is True and out[1]["keep"] is False
    assert out[2]["flag_long"] is True and out[2]["keep"] is False


def test_partition_invariance(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    a = sorted(map(tuple, repetition_stats(docs).collect()))
    b = sorted(
        map(
            tuple,
            repetition_stats(docs.repartition(13, "text")).collect(),
        )
    )
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="ngram sizes"):
        repetition_stats(df, top_n=0)


def test_null_text_zero_counts_null_sizes_null_keep(spark):
    """The documented NULL-text contract (ADVICE r10 fixed the
    docstring to match verified behavior): zero counts, NULL
    n_tokens/total_chars, and NULL (not false) gopher flags/keep —
    null-text rows propagate as unknown."""
    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e")], "doc_id long, text string"
    )
    stats = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = stats[1]
    assert r1["top_ngram"] == "" and r1["top_ngram_count"] == 0
    assert r1["dup_ngram_count"] == 0 and r1["dup_ngram_chars"] == 0
    assert r1["n_tokens"] is None and r1["total_chars"] is None
    flags = {
        r["doc_id"]: r for r in gopher_flags(repetition_stats(df)).collect()
    }
    f1 = flags[1]
    assert f1["flag_short"] is None and f1["keep"] is None
    assert flags[2]["keep"] is not None
