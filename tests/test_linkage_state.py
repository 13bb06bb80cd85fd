"""linkage_state — the persisted SymSpell variant index: two-batch
append equals one-shot build, replay idempotence, the max_dist mixing
guard, and the empty-store loud failure.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from etlhelper_spark.functions import edit_distance_join
from etlhelper_spark.operators import (
    append_linkage_masters,
    forget_from_linkage_state,
    link_batch,
    read_linkage_state,
)


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="ehs_linkage_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _masters(spark, n=40):
    return spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(n)], "id long, s string"
    )


def _dirty(spark, n=40):
    # one substitution per name at an id-derived digit position
    rows = []
    for i in range(n):
        s = f"Customer#{i:09d}"
        p = 9 + (i % 8)
        rows.append((1000 + i, s[:p] + "X" + s[p + 1 :]))
    return spark.createDataFrame(rows, "id long, s string")


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["dist"]) for r in df.collect()}


def test_two_batch_append_equals_oneshot_join(spark, state_dir):
    m = _masters(spark)
    d = _dirty(spark)
    append_linkage_masters(m.where("id % 2 = 0"), state_dir, 0, max_dist=1)
    append_linkage_masters(m.where("id % 2 = 1"), state_dir, 1, max_dist=1)
    got = _pairs(link_batch(d, state_dir))
    want = _pairs(edit_distance_join(d, m, max_dist=1))
    assert got == want and len(got) > 0
    # every dirty row links to its own master at distance 1
    assert all((1000 + i, i, 1) in got for i in range(40))


def test_replay_is_idempotent(spark, state_dir):
    m = _masters(spark)
    append_linkage_masters(m, state_dir, 0, max_dist=1)
    before = _pairs(link_batch(_dirty(spark), state_dir))
    n_rows = read_linkage_state(spark, state_dir).count()
    # redelivered batch overwrites its own dir: same rows, same links
    append_linkage_masters(m, state_dir, 0, max_dist=1)
    assert read_linkage_state(spark, state_dir).count() == n_rows
    assert _pairs(link_batch(_dirty(spark), state_dir)) == before


def test_max_dist_mixing_guard(spark, state_dir):
    m = _masters(spark, 10)
    append_linkage_masters(m, state_dir, 0, max_dist=1)
    with pytest.raises(ValueError, match="max_dist"):
        append_linkage_masters(m, state_dir, 1, max_dist=2)
    with pytest.raises(ValueError):
        append_linkage_masters(m, state_dir, 2, max_dist=3)


def test_empty_store_fails_loudly(spark, state_dir):
    with pytest.raises(ValueError, match="no linkage index"):
        link_batch(_dirty(spark, 5), state_dir)


def test_forget_removes_master_from_linkage(spark, state_dir):
    m = _masters(spark)
    append_linkage_masters(m.where("id % 2 = 0"), state_dir, 0, max_dist=1)
    append_linkage_masters(m.where("id % 2 = 1"), state_dir, 1, max_dist=1)
    doomed = [3, 7, 12]
    n_rows = read_linkage_state(spark, state_dir).count()
    n_erased = forget_from_linkage_state(spark, state_dir, doomed)
    # a master contributes its DISTINCT deletion variants (repeated
    # chars collapse: deleting any of the zeros gives the same string)
    expect = sum(
        len({s} | {s[:i] + s[i + 1 :] for i in range(len(s))})
        for s in (f"Customer#{i:09d}" for i in doomed)
    )
    assert n_erased == expect
    assert read_linkage_state(spark, state_dir).count() == n_rows - n_erased
    got = _pairs(link_batch(_dirty(spark), state_dir))
    want = _pairs(
        edit_distance_join(
            _dirty(spark), m.where(~m["id"].isin(doomed)), max_dist=1
        )
    )
    assert got == want
    assert not any(mid in doomed for _, mid, _ in got)
    # the store keeps working: an append after the erase is linkable
    append_linkage_masters(
        spark.createDataFrame([(900, "Customer#000000003")], "id long, s string"),
        state_dir,
        2,
        max_dist=1,
    )
    got2 = _pairs(link_batch(_dirty(spark), state_dir))
    assert (1003, 900, 1) in got2


def test_forget_via_orchestrator(spark, state_dir):
    from etlhelper_spark.operators import forget_everywhere

    m = _masters(spark, 10)
    append_linkage_masters(m, state_dir, 0, max_dist=1)
    s4 = "Customer#000000004"
    expect = len({s4} | {s4[:i] + s4[i + 1 :] for i in range(len(s4))})
    out = forget_everywhere(spark, [4], linkage_state_dir=state_dir)
    assert out == {"linkage_index": expect}
    assert not any(
        mid == 4 for _, mid, _ in _pairs(link_batch(_dirty(spark, 10), state_dir))
    )


def test_streaming_link_drains_and_replays(spark, state_dir, tmp_path):
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from etlhelper_spark.operators import link_batch, streaming_link

    m = _masters(spark)
    append_linkage_masters(m, state_dir, 0, max_dist=1)
    d = _dirty(spark)
    feed = str(tmp_path / "feed")
    out_dir = str(tmp_path / "out")
    seen: set = set()
    t0 = time.time() - 1000
    for i in (0, 1):
        d.where(F.col("id") % 2 == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(feed)
        new = set(glob.glob(os.path.join(feed, "part-*"))) - seen
        for p in new:
            os.utime(p, (t0 + 100 * i, t0 + 100 * i))
        seen |= new
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    streaming_link(stream, state_dir, str(tmp_path / "ckpt"), out_dir)
    drained = spark.read.parquet(out_dir)
    # two micro-batches, partitioned by their id
    assert {r["batch"] for r in drained.select("batch").distinct().collect()} == {0, 1}
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in drained.collect()}
    want = _pairs(link_batch(d, state_dir))
    assert got == want
    # redelivery of micro-batch 1 overwrites its own partition: same rows
    link_batch(d.where("id % 2 = 1"), state_dir).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "batch=1"))
    again = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert again == want


def test_crash_window_incomplete_base_invisible(spark, state_dir):
    """An erase whose base_v<k> write crashed before the marker must
    be invisible: readers keep serving the old complete state (the
    _COMPACTED marker-last discipline shared with dedup_state)."""
    import os

    m = _masters(spark, 20)
    append_linkage_masters(m, state_dir, 0, max_dist=1)
    before = _pairs(link_batch(_dirty(spark, 20), state_dir))
    # simulate a torn erase: half-written base dir, NO marker
    torn = os.path.join(state_dir, "variants", "base_v1")
    os.makedirs(torn, exist_ok=True)
    read_linkage_state(spark, state_dir).limit(3).write.mode(
        "overwrite"
    ).parquet(torn)
    marker = os.path.join(torn, "_COMPACTED")
    if os.path.exists(marker):
        os.remove(marker)
    assert _pairs(link_batch(_dirty(spark, 20), state_dir)) == before
    # a real erase afterwards overwrites the torn dir and completes
    n = forget_from_linkage_state(spark, state_dir, [0])
    assert n > 0
    after = _pairs(link_batch(_dirty(spark, 20), state_dir))
    assert after == {(a, b, d) for (a, b, d) in before if b != 0}


def test_d2_links_two_edit_typos(spark, state_dir):
    m = _masters(spark, 20)
    append_linkage_masters(m, state_dir, 0, max_dist=2)
    # two substitutions: only reachable at d=2
    rows = [
        (2000 + i, f"Customer#{i:09d}"[:10] + "XY" + f"Customer#{i:09d}"[12:])
        for i in range(20)
    ]
    d2 = spark.createDataFrame(rows, "id long, s string")
    got = _pairs(link_batch(d2, state_dir))
    want = _pairs(edit_distance_join(d2, m, max_dist=2))
    assert got == want
    assert all((2000 + i, i, 2) in got for i in range(20))


# ---------------------------------------------------------- phonetic
def _phonetic_masters(spark):
    return spark.createDataFrame(
        [(1, "SMITH"), (2, "ROBERT"), (3, "LOPEZ")], "id long, s string"
    )


def test_phonetic_substore_links_spelling_variants(spark, state_dir):
    m = _phonetic_masters(spark)
    append_linkage_masters(
        m.where("id <= 2"), state_dir, 0, max_dist=1, phonetic=True
    )
    append_linkage_masters(
        m.where("id = 3"), state_dir, 1, max_dist=1, phonetic=True
    )
    # SMYTH is d=1 from SMITH (both paths); RUPERT is d=2, phonetic
    # only; QQQQQ matches nothing
    feed = spark.createDataFrame(
        [(10, "SMYTH"), (11, "RUPERT"), (12, "QQQQQ")],
        "id long, s string",
    )
    got = {
        (r.id_a, r.id_b): (r.dist, r.phonetic)
        for r in link_batch(feed, state_dir, include_phonetic=True).collect()
    }
    assert got[(10, 1)] == (1, True)
    assert got[(11, 2)] == (2, True)
    assert not any(ida == 12 for ida, _ in got)
    # default (edit-only) output shape and content are unchanged
    edit_only = _pairs(link_batch(feed, state_dir))
    assert edit_only == {(10, 1, 1)}


def test_phonetic_mixing_guard(spark, state_dir):
    m = _phonetic_masters(spark)
    append_linkage_masters(m, state_dir, 0, max_dist=1, phonetic=True)
    with pytest.raises(ValueError, match="phonetic"):
        append_linkage_masters(m, state_dir, 1, max_dist=1)
    d2 = tempfile.mkdtemp(prefix="ehs_linkage_")
    try:
        append_linkage_masters(m, d2, 0, max_dist=1)
        with pytest.raises(ValueError, match="phonetic"):
            append_linkage_masters(m, d2, 1, max_dist=1, phonetic=True)
        # linking phonetically against an unkeyed store fails loudly
        with pytest.raises(ValueError, match="no phonetic substore"):
            link_batch(m, d2, include_phonetic=True)
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_forget_covers_phonetic_substore(spark, state_dir):
    m = _phonetic_masters(spark)
    append_linkage_masters(m, state_dir, 0, max_dist=1, phonetic=True)
    feed = spark.createDataFrame([(10, "SMYTH")], "id long, s string")
    before = link_batch(feed, state_dir, include_phonetic=True)
    assert before.where("id_b = 1").count() == 1
    n = forget_from_linkage_state(spark, state_dir, [1])
    assert n > 0
    after = link_batch(feed, state_dir, include_phonetic=True)
    assert after.where("id_b = 1").count() == 0


def test_streaming_link_phonetic_equals_batch(spark, state_dir, tmp_path):
    from etlhelper_spark.operators import streaming_link

    m = _phonetic_masters(spark)
    append_linkage_masters(m, state_dir, 0, max_dist=1, phonetic=True)
    feed = spark.createDataFrame(
        [(10, "SMYTH"), (11, "RUPERT")], "id long, s string"
    )
    fd = str(tmp_path / "feed")
    feed.coalesce(1).write.parquet(fd)
    out = str(tmp_path / "out")
    streaming_link(
        spark.readStream.schema(feed.schema).parquet(fd),
        state_dir,
        str(tmp_path / "ckpt"),
        out,
        include_phonetic=True,
    )
    got = {
        (r.id_a, r.id_b): (r.dist, r.phonetic)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.id_a, r.id_b): (r.dist, r.phonetic)
        for r in link_batch(feed, state_dir, include_phonetic=True).collect()
    }
    assert got == want and (11, 2) in got


def test_phonetic_bucket_cap_and_degenerate_key(spark, state_dir):
    """Zipf guard (ADVICE r10): a hot phonetic key past
    phonetic_max_bucket drops out of the phonetic pass (the names
    stay reachable via the edit path), and the degenerate '000' key
    of empty / non-letter names never phonetic-links at all."""
    rows = [(i, "SMITH") for i in range(1, 6)]  # S530 x5: hot bucket
    rows += [(20, "ROBERT"), (30, "12345"), (31, "???")]
    m = spark.createDataFrame(rows, "id long, s string")
    append_linkage_masters(m, state_dir, 0, max_dist=1, phonetic=True)
    feed = spark.createDataFrame(
        [(100, "SMYTH"), (101, "RUPERT"), (102, "###"), (103, "9999")],
        "id long, s string",
    )
    capped = {
        (r.id_a, r.id_b): r.phonetic
        for r in link_batch(
            feed, state_dir, include_phonetic=True,
            phonetic_max_bucket=4,
        ).collect()
    }
    # SMYTH still reaches every SMITH via the EDIT path (d=1), but
    # none of those pairs is phonetic-flagged: the S530 bucket (5 > 4)
    # was dropped from phonetic blocking
    for i in range(1, 6):
        assert capped[(100, i)] is False
    assert capped[(101, 20)] is True  # R163 bucket is cold: kept
    # non-letter names collapse to '000' on BOTH sides; no pair links
    assert not any(ida in (102, 103) for ida, _ in capped)
    # uncapped: the hot bucket phonetic-links and degenerates still do
    # not (the '000' exclusion is unconditional)
    uncapped = {
        (r.id_a, r.id_b): r.phonetic
        for r in link_batch(
            feed, state_dir, include_phonetic=True
        ).collect()
    }
    assert all(uncapped[(100, i)] is True for i in range(1, 6))
    assert not any(ida in (102, 103) for ida, _ in uncapped)
