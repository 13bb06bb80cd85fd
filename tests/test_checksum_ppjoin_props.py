"""Properties: checksum order/partitioning invariance; PPJoin = naive."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from etlhelper_spark.functions.dedup import ngram_jaccard_pairs
from etlhelper_spark.operators.profile import table_checksum


def test_checksum_invariant_to_order_and_partitioning(spark):
    rows = [(i, f"name{i % 7}", None if i % 5 == 0 else float(i)) for i in range(200)]
    base = spark.createDataFrame(rows, "id long, name string, v double")
    a = table_checksum(base).collect()[0]
    shuffled = spark.createDataFrame(
        random.Random(7).sample(rows, len(rows)),
        "id long, name string, v double",
    ).repartition(13)
    b = table_checksum(shuffled).collect()[0]
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])


def test_checksum_detects_single_value_change(spark):
    rows = [(i, f"x{i}") for i in range(100)]
    a = table_checksum(
        spark.createDataFrame(rows, "id long, s string")
    ).collect()[0]
    rows[50] = (50, "x50!")
    b = table_checksum(
        spark.createDataFrame(rows, "id long, s string")
    ).collect()[0]
    assert a["checksum"] != b["checksum"]


def test_checksum_distinguishes_null_from_empty(spark):
    a = table_checksum(
        spark.createDataFrame([(1, None)], "id long, s string")
    ).collect()[0]
    b = table_checksum(
        spark.createDataFrame([(1, "")], "id long, s string")
    ).collect()[0]
    assert a["checksum"] != b["checksum"]


def _naive_jaccard_pairs(docs, n, threshold):
    def shingles(text):
        toks = text.lower().strip().split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        } - {""}

    sets = {i: shingles(t) for i, t in docs}
    out = set()
    for (i, si), (j, sj) in itertools.combinations(sorted(sets.items()), 2):
        if not si or not sj:
            continue
        jac = len(si & sj) / len(si | sj)
        if round(jac, 4) >= threshold:
            out.add((i, j))
    return out


def test_ppjoin_matches_naive_on_random_corpora(spark):
    """Prefix/length filters must stay EXACT: same pairs as brute force."""
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(30)]
    for trial in range(5):
        docs = []
        for i in range(30):
            base = [rng.choice(vocab) for _ in range(rng.randint(6, 14))]
            docs.append((i, " ".join(base)))
            if rng.random() < 0.4:  # planted near-dup: mutate one token
                mutated = base[:]
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
                docs.append((1000 + i, " ".join(mutated)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", shingle_size=2, threshold=0.5
            ).collect()
        }
        expect = _naive_jaccard_pairs(docs, 2, 0.5)
        assert got == expect, f"trial {trial}: {got ^ expect}"


def test_minhash_banding_uses_leftover_seeds(spark):
    """Indivisible num_hashes/bands: the leftover seeds form a final
    partial band (seed // rows_per_band grouping), not silently drop —
    candidates must match banding computed from the long-format
    signatures."""
    import hashlib

    from etlhelper_spark.functions.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(8)))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            df, "doc_id", "text", num_hashes=10, bands=4, shingle_size=2
        ).collect()
    }
    sigs = minhash_signatures(
        df, "doc_id", "text", num_hashes=10, shingle_size=2
    ).collect()
    per_doc: dict = {}
    for r in sigs:
        per_doc.setdefault(r["id"], {})[r["seed"]] = r["minhash"]
    rows_per_band = 10 // 4
    buckets: dict = {}
    for doc, mh in per_doc.items():
        for band in range(5):  # 4 full + 1 leftover
            seeds = [s for s in sorted(mh) if s // rows_per_band == band]
            if not seeds:
                continue
            key = hashlib.md5(
                ",".join(str(mh[s]) for s in seeds).encode()
            ).hexdigest()
            buckets.setdefault((band, key), []).append(doc)
    expect = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                expect.add((ms[i], ms[j]))
    assert got == expect


def test_minhash_max_bucket_skips_mass_duplicate_buckets(spark):
    """The mass-duplication guard: a planted byte-identical group
    larger than max_bucket contributes NO pairs (its band buckets are
    all oversized and skipped), while pairs between the genuinely
    fuzzy documents are unchanged vs the uncapped run. Default None
    keeps exact emit-every-pair semantics."""
    from etlhelper_spark.functions.dedup import minhash_lsh_candidates

    # 12 byte-identical docs (0..11) + 2 fuzzy near-dup docs (100, 101)
    dup = [(i, "the same exact planted document body") for i in range(12)]
    fuzzy = [
        (100, "alpha beta gamma delta epsilon zeta"),
        (101, "alpha beta gamma delta epsilon eta"),
    ]
    df = spark.createDataFrame(dup + fuzzy, "doc_id long, text string")
    kw = dict(num_hashes=16, bands=4, shingle_size=2)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df, "doc_id", "text", **kw).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            df, "doc_id", "text", max_bucket=8, **kw
        ).collect()
    }
    # uncapped: all 66 identical pairs present
    assert {(a, b) for a in range(12) for b in range(12) if a < b} <= uncapped
    # capped: every pair within the oversized group is gone...
    assert not any(a < 12 and b < 12 for a, b in capped)
    # ...and the fuzzy pair survives identically if it was a candidate
    assert ((100, 101) in capped) == ((100, 101) in uncapped)
    # a cap ABOVE the group size changes nothing
    loose = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            df, "doc_id", "text", max_bucket=64, **kw
        ).collect()
    }
    assert loose == uncapped
