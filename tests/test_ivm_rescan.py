"""maintain_rollup_rescan (operators/ivm.py): delete-capable IVM for
views carrying non-invertible (min/max) measures.

The append-only merge (merge_rollup_monotonic) REFUSES retractions
because deleting the current extremum cannot be undone from the
aggregate alone. The rescan merge handles them by recomputing min/max
for exactly the retraction-touched groups from the post-delete source.
These tests pin the cases that distinguish it from naive merges:

- deleting the current minimum must RAISE the stored min (a
  least/greatest merge would keep the stale value forever);
- untouched groups must not be rescanned (their min/max comes from
  the pure append-side combine);
- a group deleted in full must vanish;
- count/sum stay exact under mixed append+delete batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.operators.ivm import (
    maintain_rollup_rescan,
    rollup_partial_monotonic,
)

KEYS = ["g"]
SUMS = {"sv": "v"}
MINS = {"mn": "v"}
MAXS = {"mx": "v"}


def _maintain(spark, hist_rows, append_rows, delete_rows):
    hist = spark.createDataFrame(hist_rows, ["g", "v"])
    appends = spark.createDataFrame(
        append_rows or [], "g string, v long"
    )
    deletes = spark.createDataFrame(
        delete_rows or [], "g string, v long"
    )
    survivors = [
        r for r in hist_rows + (append_rows or [])
        if not _consume(delete_rows, r)
    ]
    source = spark.createDataFrame(survivors or [], "g string, v long")
    base = rollup_partial_monotonic(hist, KEYS, SUMS, MINS, MAXS)
    out = maintain_rollup_rescan(
        base, appends, deletes, KEYS, source, SUMS, MINS, MAXS
    )
    return {
        r["g"]: (r["n"], r["sv"], r["mn"], r["mx"]) for r in out.collect()
    }, survivors


def _consume(delete_rows, row):
    """Multiset membership: each delete row removes ONE matching
    source row (bag semantics, like a real CDC delete)."""
    if not delete_rows:
        return False
    try:
        delete_rows.remove(row)
        return True
    except ValueError:
        return False


def _expected(survivors):
    agg: dict = {}
    for g, v in survivors:
        n, sv, mn, mx = agg.get(g, (0, 0, None, None))
        agg[g] = (
            n + 1,
            sv + v,
            v if mn is None else min(mn, v),
            v if mx is None else max(mx, v),
        )
    return agg


def test_deleting_current_min_raises_stored_min(spark):
    got, survivors = _maintain(
        spark,
        hist_rows=[("a", 1), ("a", 5), ("a", 9)],
        append_rows=[],
        delete_rows=[("a", 1)],
    )
    assert got == _expected(survivors)
    assert got["a"][2] == 5  # min rose from 1 to 5 — the rescan case


def test_deleting_current_max_lowers_stored_max(spark):
    got, survivors = _maintain(
        spark,
        hist_rows=[("a", 1), ("a", 5), ("a", 9)],
        append_rows=[("a", 2)],
        delete_rows=[("a", 9)],
    )
    assert got == _expected(survivors)
    assert got["a"][3] == 5


def test_untouched_group_keeps_append_combine(spark):
    got, survivors = _maintain(
        spark,
        hist_rows=[("a", 4), ("b", 7)],
        append_rows=[("b", 2), ("b", 11)],
        delete_rows=[("a", 4)],
    )
    assert got == _expected(survivors)
    assert "a" not in got  # fully deleted group vanished
    assert got["b"] == (3, 20, 2, 11)


def test_whole_group_drained_through_rescan_path(spark):
    """A multi-row group whose EVERY row is deleted in one batch: the
    group is retraction-touched, so it goes through the rescan path —
    the targeted scan of the post-delete source finds NO rows for it
    (left join yields null min/max), and the additive count netting to
    zero must drop it entirely rather than emit a null-extrema row.
    This is the rescan-path analogue of q170's additive
    drop-to-absence (and what q171's all-'error'-events delete feed
    exercises at corpus scale)."""
    got, survivors = _maintain(
        spark,
        hist_rows=[("z", 1), ("z", 5), ("z", 9), ("a", 2)],
        append_rows=[("a", 3)],
        delete_rows=[("z", 1), ("z", 5), ("z", 9)],
    )
    assert got == _expected(survivors)
    assert "z" not in got
    assert got["a"] == (2, 5, 2, 3)


def test_full_delete_plus_append_rebuilds_from_rescan(spark):
    """All historical rows of a group deleted AND new rows appended in
    the SAME batch: the group survives, and because it is
    retraction-touched its min/max must come from the rescan of the
    post-batch source (which holds only the appended rows) — the
    append-side least/greatest combine against the stale base extrema
    would be wrong on both ends."""
    got, survivors = _maintain(
        spark,
        hist_rows=[("r", -10), ("r", 50)],
        append_rows=[("r", 3), ("r", 7)],
        delete_rows=[("r", -10), ("r", 50)],
    )
    assert got == _expected(survivors)
    assert got["r"] == (2, 10, 3, 7)


def test_group_born_in_append_batch(spark):
    got, survivors = _maintain(
        spark,
        hist_rows=[("a", 4)],
        append_rows=[("c", 3), ("c", 8)],
        delete_rows=[],
    )
    assert got == _expected(survivors)
    assert got["c"] == (2, 11, 3, 8)


def test_mixed_batch_matches_recompute(spark):
    hist = [("a", i) for i in range(10)] + [("b", i * 3) for i in range(6)]
    appends = [("a", 100), ("b", -50), ("c", 7)]
    deletes = [("a", 0), ("a", 9), ("b", 0), ("b", 15)]
    got, survivors = _maintain(spark, hist, appends, deletes)
    assert got == _expected(survivors)
    # the interesting assertions: both extrema of 'a' were deleted,
    # and 'b' gained a new min from the append while losing its max
    assert got["a"][2] == 1 and got["a"][3] == 100
    assert got["b"][2] == -50 and got["b"][3] == 12


def test_streaming_cdc_rollup_equals_recompute(spark, tmp_path):
    """End-to-end streaming CDC maintenance: a 3-file feed of mixed
    inserts/deletes drained availableNow must leave state equal to the
    recompute over net-surviving rows, with fully-deleted groups
    absent."""
    import os

    from etlhelper_spark.operators.ivm import (
        read_rollup_state,
        streaming_cdc_rollup,
    )

    feed = [
        # batch-ish thirds: inserts for a,b; delete one of a's rows
        # later; c inserted then fully deleted
        ("I", "a", 10), ("I", "a", 20), ("I", "b", 5),
        ("I", "c", 7), ("I", "b", 6), ("D", "a", 10),
        ("D", "c", 7), ("I", "a", 30), ("D", "b", 5),
    ]
    src_dir = str(tmp_path / "cdc_src")
    for i in range(3):
        spark.createDataFrame(
            feed[i * 3 : (i + 1) * 3], ["op", "g", "v"]
        ).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema("op string, g string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    streaming_cdc_rollup(
        stream, ["g"], {"sv": "v"}, state, str(tmp_path / "ckpt")
    )
    got = {
        r["g"]: (r["n"], r["sv"])
        for r in read_rollup_state(spark, state).collect()
    }
    assert got == {"a": (2, 50), "b": (1, 6)}
    assert "c" not in got  # insert-then-delete round-trips to absence


def test_streaming_cdc_intermediate_zero_count_not_lost(spark, tmp_path):
    """Regression (caught by the sf0.001 replica): a batch that nets a
    group to count 0 with a NONZERO sum — delete of value x plus
    insert of value y — must not drop the group from intermediate
    state, or a later batch silently loses y−x."""
    import os

    from etlhelper_spark.operators.ivm import (
        read_rollup_state,
        streaming_cdc_rollup,
    )

    batches = [
        [("I", "g", 100)],
        # net n = 0 for 'g' but sum moves by +150-100 = +50
        [("D", "g", 100), ("I", "g", 150)],
        [("I", "g", 25)],
    ]
    src_dir = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ["op", "g", "v"]).coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema("op string, g string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    streaming_cdc_rollup(
        stream, ["g"], {"sv": "v"}, state, str(tmp_path / "ckpt")
    )
    got = {
        r["g"]: (r["n"], r["sv"])
        for r in read_rollup_state(spark, state).collect()
    }
    # survivors: 150 and 25 -> n=2, sum=175 (the buggy drop gave 125)
    assert got == {"g": (2, 175)}


def test_multiset_minmax_survives_extremum_delete(spark):
    """Value-level state: deleting the current min (as a negative
    delta at (keys, value) granularity) must surface the next value,
    with no rescan and no append-only restriction; duplicated values
    survive partial deletion."""
    from etlhelper_spark.operators.ivm import (
        merge_rollup,
        multiset_minmax_view,
        rollup_partial,
    )

    rows = [("a", 1), ("a", 1), ("a", 5), ("a", 9), ("b", 3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    base = rollup_partial(df, ["g", "v"], {})
    deletes = spark.createDataFrame(
        [("a", 1), ("a", 9), ("b", 3)], ["g", "v"]
    )
    retract = rollup_partial(deletes, ["g", "v"], {}).select(
        "g", "v", (-F.col("n")).alias("n")
    )
    state = merge_rollup(base, retract, ["g", "v"])
    got = {
        r["g"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in multiset_minmax_view(state, ["g"]).collect()
    }
    # one of the two 1s survives (multiset!), 9 is gone -> max 5;
    # survivors of a = [1, 5]
    assert got == {"a": (2, 6, 1, 5)}
    # 'b' fully deleted -> absent from the view read
    assert "b" not in got


def test_sketch_state_union_across_batches(spark, tmp_path):
    """Persisted HLL state: overlapping batches (idempotent union) and
    arbitrary splits must converge to the full-corpus estimate, with
    sketch binaries round-tripping through parquet between applies."""
    from pyspark.sql import functions as F

    from etlhelper_spark.operators.ivm import sketch_rollup_incremental

    rows = [("g", i % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, ["g", "u"])
    state = str(tmp_path / "sk")
    b0 = df.where(F.col("u") < 300)
    b1 = df.where(F.col("u") >= 250)  # overlaps b0 on 250..299
    sketch_rollup_incremental(b0, state, 0, ["g"], "u")
    out = sketch_rollup_incremental(b1, state, 1, ["g"], "u")
    est = out.select(F.hll_sketch_estimate("sketch").alias("e")).first()["e"]
    assert abs(est - 500) / 500 <= 0.05
    # replay batch 1: idempotent (distinct-union), same estimate
    out_r = sketch_rollup_incremental(b1, state, 1, ["g"], "u")
    est_r = out_r.select(
        F.hll_sketch_estimate("sketch").alias("e")
    ).first()["e"]
    assert est_r == est
