"""apply_changes: initial load, snapshot-wins, deletes, re-inserts."""

from __future__ import annotations

from etlhelper_spark.operators.cdc import apply_changes


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, ["k", "v", "op", "seq"]
    )


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


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
