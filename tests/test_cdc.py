"""apply_changes: initial load, snapshot-wins, deletes, re-inserts."""

from __future__ import annotations

from etlhelper_spark.operators.cdc import apply_changes


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, op string, seq long"
    )


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_initial_load_without_snapshot(spark):
    feed = _changes(
        spark,
        [(1, "a", "I", 1), (1, "b", "U", 2), (2, "x", "I", 1)],
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changes(None, feed, ["k"], ["seq"]).collect()
    }
    assert got == {1: "b", 2: "x"}


def test_snapshot_wins_when_key_has_no_changes(spark):
    snap = _snapshot(spark, [(1, "old"), (2, "keep")])
    feed = _changes(spark, [(1, "new", "U", 1)])
    got = {
        r["k"]: r["v"]
        for r in apply_changes(snap, feed, ["k"], ["seq"]).collect()
    }
    assert got == {1: "new", 2: "keep"}


def test_delete_removes_key_and_reinsert_revives(spark):
    snap = _snapshot(spark, [(1, "old"), (2, "doomed")])
    feed = _changes(
        spark,
        [(2, None, "D", 1), (3, "born", "I", 1), (3, None, "D", 2),
         (3, "back", "I", 3)],
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changes(snap, feed, ["k"], ["seq"]).collect()
    }
    assert got == {1: "old", 3: "back"}


def test_bookkeeping_columns_dropped(spark):
    feed = _changes(spark, [(1, "a", "I", 1)])
    out = apply_changes(None, feed, ["k"], ["seq"])
    assert out.columns == ["k", "v"]


def test_fuzz_against_python_model(spark):
    """Randomized feeds vs a sequential pure-Python replay."""
    import random

    rng = random.Random(42)
    for trial in range(8):
        keys = range(rng.randint(1, 6))
        snap_rows = [(k, f"s{k}") for k in keys if rng.random() < 0.5]
        feed_rows = [
            (rng.choice(list(keys)), f"v{i}", rng.choice("IUD"), i)
            for i in range(rng.randint(0, 25))
        ]
        # model: replay in sequence order
        state = dict(snap_rows)
        for k, v, op, _ in feed_rows:
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v
        # operator: latest-wins window (order shuffled to prove the
        # sequence column, not input order, decides)
        shuffled = feed_rows[:]
        rng.shuffle(shuffled)
        snap = _snapshot(spark, snap_rows) if snap_rows else None
        feed = _changes(spark, shuffled) if shuffled else _changes(
            spark, [(0, None, "D", -1)]
        )
        got = {
            r["k"]: r["v"]
            for r in apply_changes(snap, feed, ["k"], ["seq"]).collect()
        }
        expect = dict(state)
        if not shuffled:
            expect.pop(0, None)  # the placeholder delete
        assert got == expect, f"trial {trial}"
