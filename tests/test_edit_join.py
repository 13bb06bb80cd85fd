"""edit_distance_join — exactness vs a brute-force oracle, multiset
(duplicate-gram) handling, the small-string block, the self-join
convention, and partition invariance.

The brute-force comparisons use Python's own Levenshtein so the test
oracle shares no code with the operator under test.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions import edit_distance_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _truth(rows_a, rows_b, d):
    return {
        (ia, ib, _lev(sa, sb))
        for ia, sa in rows_a
        for ib, sb in rows_b
        if abs(len(sa) - len(sb)) <= d and _lev(sa, sb) <= d
    }


def _run(spark, rows_a, rows_b, d, q=2, strategy="auto"):
    a = spark.createDataFrame(rows_a, "id long, s string")
    b = spark.createDataFrame(rows_b, "id long, s string")
    out = edit_distance_join(a, b, max_dist=d, q=q, strategy=strategy)
    return {(r["id_a"], r["id_b"], r["dist"]) for r in out.collect()}


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_matches_bruteforce_dense_corpus(spark, strategy):
    # small alphabet + short strings => many near-pairs, exercising
    # the candidate filters where misses would actually show
    rng = random.Random(7)
    rows_a = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(4, 9))))
        for i in range(120)
    ]
    rows_b = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(4, 9))))
        for i in range(120)
    ]
    for d in (1, 2):
        assert _run(spark, rows_a, rows_b, d, strategy=strategy) == _truth(
            rows_a, rows_b, d
        )


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_duplicate_grams_multiset_exact(spark, strategy):
    # 'aaaa'-style strings: every q-gram identical; occurrence tagging
    # (grams) / variant dedup (deletes) must keep these pairs
    rows = [(1, "aaaa"), (2, "aaaaa"), (3, "aaab"), (4, "bbbb"), (5, "aaaa")]
    got = _run(spark, rows, rows, 1, strategy=strategy)
    assert got == _truth(rows, rows, 1)
    assert (1, 5, 0) in got and (1, 2, 1) in got and (1, 3, 1) in got


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_small_string_block(spark, strategy):
    # strings at/below q*d+q-1 chars have too few grams for the
    # theorem — the length-band block must cover them, incl. empty
    rows_a = [(1, ""), (2, "a"), (3, "ab"), (4, "abc"), (5, "xyz")]
    rows_b = [(10, "b"), (11, "ab"), (12, "abd"), (13, "abcd"), (14, "")]
    for d in (1, 2):
        assert _run(spark, rows_a, rows_b, d, strategy=strategy) == _truth(
            rows_a, rows_b, d
        )


def test_mixed_lengths_cross_block_boundary(spark):
    # pairs straddling the small/main boundary (len 3 vs len 4 at
    # q=2,d=1 where small_len=3) must appear exactly once
    rows = [(1, "abc"), (2, "abcd"), (3, "abd"), (4, "abcde"), (5, "zz")]
    got = _run(spark, rows, rows, 1, strategy="grams")
    assert got == _truth(rows, rows, 1)


def test_deletes_rejects_large_d_and_bad_strategy(spark):
    a = spark.createDataFrame([(1, "abc")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_join(a, a, max_dist=3, strategy="deletes")
    with pytest.raises(ValueError):
        edit_distance_join(a, a, max_dist=1, strategy="bogus")
    # auto falls back to grams at d=3 and stays exact
    rows = [(1, "abcdef"), (2, "abcxyz"), (3, "qrstuv")]
    got = _run(spark, rows, rows, 3, strategy="auto")
    assert got == _truth(rows, rows, 3)


def test_threshold_excludes_above_d(spark):
    rows_a = [(1, "kitten")]
    rows_b = [(2, "sitting"), (3, "kitten"), (4, "mitten")]
    got = _run(spark, rows_a, rows_b, 1)
    assert got == {(1, 3, 0), (1, 4, 1)}
    got2 = _run(spark, rows_a, rows_b, 3)
    assert (1, 2, 3) in got2


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_partition_invariance(spark, strategy):
    rng = random.Random(13)
    rows = [
        (i, "".join(rng.choice("abcd") for _ in range(rng.randint(3, 10))))
        for i in range(80)
    ]
    a = spark.createDataFrame(rows, "id long, s string")
    base = edit_distance_join(a, a, max_dist=2, strategy=strategy)
    got1 = {tuple(r) for r in base.collect()}
    a7 = a.repartition(7)
    got7 = {
        tuple(r)
        for r in edit_distance_join(
            a7, a7, max_dist=2, strategy=strategy
        ).collect()
    }
    assert got1 == got7 == _truth(rows, rows, 2)


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_unicode_codepoint_semantics(spark, strategy):
    # Spark's length/substring/levenshtein are code-point based; the
    # operator must agree with Python's character-level reference on
    # multi-byte text (accents, CJK) for both strategies
    rows = [
        (1, "café"), (2, "cafe"), (3, "cafés"),
        (4, "naïve"), (5, "naive"),
        (6, "日本語"), (7, "日本誤"), (8, "日本語です"),
    ]
    got = _run(spark, rows, rows, 1, strategy=strategy)
    assert got == _truth(rows, rows, 1)


def test_deletion_variants_match_python_reference(spark):
    # the deletes strategy's entire correctness rests on the variant
    # generator: compare the expression against a Python reference on
    # 400 random strings (mixed lengths 0..12, repeats, unicode)
    import random

    from pyspark.sql import functions as F

    from etlhelper_spark.functions.dedup import _deletion_variants

    rng = random.Random(29)
    alphabet = "abZ09#é日"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))))
        for i in range(400)
    ]

    def ref(s, d):
        out = {s}
        d1 = {s[:i] + s[i + 1 :] for i in range(len(s))}
        out |= d1
        if d == 2:
            for v in d1:
                out |= {v[:i] + v[i + 1 :] for i in range(len(v))}
        return out

    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 2):
        got = {
            r["id"]: set(r["v"])
            for r in df.select(
                "id", _deletion_variants("s", d).alias("v")
            ).collect()
        }
        for i, s in rows:
            assert got[i] == ref(s, d), (s, d)


def test_nulls_dropped_and_bad_maxdist(spark):
    a = spark.createDataFrame([(1, "abc"), (2, None)], "id long, s string")
    got = _run(spark, [(1, "abc"), (2, None)], [(3, "abd")], 1)
    assert got == {(1, 3, 1)}
    with pytest.raises(ValueError):
        edit_distance_join(a, a, max_dist=0)


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_custom_column_names(spark, strategy):
    a = spark.createDataFrame(
        [(1, "kitten"), (2, "mitten")], "custkey long, name string"
    )
    got = {
        tuple(r)
        for r in edit_distance_join(
            a, a, max_dist=1, id_col="custkey", str_col="name",
            strategy=strategy,
        ).where("id_a < id_b").collect()
    }
    assert got == {(1, 2, 1)}


@pytest.mark.parametrize("strategy", ["deletes", "grams"])
def test_shared_stem_goes_through_rare_grams(spark, strategy):
    # the record-linkage shape: every string shares a long stem; both
    # strategies must still find the pairs (and only them)
    rows_a = [(i, f"Customer#{i:09d}") for i in range(60)]
    rows_b = [(100 + i, f"Customer#{i:09d}"[:-1] + "X") for i in range(60)]
    got = _run(spark, rows_a, rows_b, 1, strategy=strategy)
    assert got == _truth(rows_a, rows_b, 1)
    # each dirty name links to the 10 masters differing only in the
    # final digit (substituting X back to any digit is one edit)
    for i in range(6):
        assert (i, 100 + i, 1) in got


# ------------------------------------------------------------ phonetic
def test_phonetic_key_classic_values(spark):
    from etlhelper_spark.functions.dedup import phonetic_key

    rows = [
        ("Smith",), ("Smyth",), ("Robert",), ("Rupert",),
        ("Jackson",), ("Jaxon",), ("Tymczak",), ("",), ("123",),
    ]
    d = spark.createDataFrame(rows, "s string")
    got = {
        r["s"]: r["k"]
        for r in d.select("s", phonetic_key(F.col("s")).alias("k")).collect()
    }
    assert got["Smith"] == got["Smyth"] == "S530"
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got["Jackson"] == got["Jaxon"] == "J250"
    # no-letter inputs degrade to the padded empty key, deterministic
    assert got[""] == got["123"] == "000"


def test_phonetic_block_join_and_bucket_cap(spark):
    from etlhelper_spark.functions.dedup import phonetic_block_join

    a = spark.createDataFrame(
        [(1, "Smyth"), (2, "Rupert")], "id long, s string"
    )
    b = spark.createDataFrame(
        [(10, "Smith"), (11, "Smithe"), (12, "Robert"), (13, "Lopez")],
        "id long, s string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in phonetic_block_join(a, b).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 12)}
    # cap drops the S530 bucket (2 members > cap 1); R163 survives
    capped = {
        (r.id_a, r.id_b)
        for r in phonetic_block_join(a, b, max_bucket=1).collect()
    }
    assert capped == {(2, 12)}
