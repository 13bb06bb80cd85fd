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

def test_snapshot_state_survives_out_of_order_batches(spark, tmp_path):
    """The directed late-data case: key 10's delete (seq 3) arrives in
    batch 0, its OLDER update (seq 2) in batch 1. The tombstoned state
    must keep the key dead — the stored tombstone beats the late
    update on sequence — whereas folding the same batches through the
    stateless apply_changes loop resurrects it (the known failure the
    state exists to fix)."""
    from etlhelper_spark.operators.cdc import (
        apply_changes,
        read_snapshot_state,
        snapshot_apply_incremental,
    )

    schema = "k long, v long, op string, seq long"
    b0 = spark.createDataFrame(
        [(10, 1, "I", 1), (10, 3, "D", 3), (20, 5, "I", 1)], schema
    )
    b1 = spark.createDataFrame([(10, 2, "U", 2), (20, 6, "U", 4)], schema)
    state = str(tmp_path / "snap")
    snapshot_apply_incremental(b0, state, 0, ["k"], ["seq"])
    snapshot_apply_incremental(b1, state, 1, ["k"], ["seq"])
    got = {r["k"]: r["v"] for r in
           read_snapshot_state(spark, state, ["seq"]).collect()}
    assert got == {20: 6}  # 10 stays dead; 20 took the newer update
    # contrast: the stateless loop resurrects key 10 from the late
    # older update, because the delete's sequence was discarded
    naive0 = apply_changes(None, b0, ["k"], ["seq"])
    naive1 = apply_changes(naive0, b1, ["k"], ["seq"])
    naive = {r["k"]: r["v"] for r in naive1.collect()}
    assert naive[10] == 2  # the wrong answer the state prevents


def test_snapshot_state_replay_idempotent(spark, tmp_path):
    from etlhelper_spark.operators.cdc import (
        read_snapshot_state,
        snapshot_apply_incremental,
    )

    schema = "k long, v long, op string, seq long"
    b0 = spark.createDataFrame([(1, 1, "I", 1)], schema)
    b1 = spark.createDataFrame([(1, 9, "U", 2), (2, 4, "I", 3)], schema)
    state = str(tmp_path / "snap")
    snapshot_apply_incremental(b0, state, 0, ["k"], ["seq"])
    snapshot_apply_incremental(b1, state, 1, ["k"], ["seq"])
    first = sorted(map(tuple, read_snapshot_state(
        spark, state, ["seq"]).collect()))
    snapshot_apply_incremental(b1, state, 1, ["k"], ["seq"])  # replay
    assert sorted(map(tuple, read_snapshot_state(
        spark, state, ["seq"]).collect())) == first == [(1, 9), (2, 4)]
