"""Incremental golden-record state (operators/survivorship_state.py):
merge-equals-recompute, replay idempotence, new-cluster outer join,
all-null fields, and partition invariance."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.operators.survivorship import golden_records
from etlhelper_spark.operators.survivorship_state import (
    golden_incremental,
    read_golden_state,
    streaming_golden,
)

ROWS = [
    (1, 10, "crm", 1, None, 100.0),
    (1, 11, "web", 3, "W-555", None),
    (1, 12, "app", 2, "A-555", None),
    (2, 20, "app", 5, "A-777", None),
    (2, 21, "crm", 5, "C-777", None),
    (3, 30, "zzz", 1, "Z-1", 5.0),
    (3, 31, "zzz", 1, "Z-2", 6.0),
    # cluster 4 appears ONLY in the last arrival batch (rid % 3 == 2)
    (4, 41, "web", 0, "W-4", None),
]
SCHEMA = "ck long, rid long, src string, v long, phone string, bal double"
PRIO = {"crm": 1, "web": 2, "app": 3}
ARGS = ("ck", "rid", ["phone", "bal"], "v", "src", PRIO)


@pytest.fixture(scope="module")
def recs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _full(recs):
    return sorted(map(tuple, golden_records(recs, *ARGS).collect()))


def _fold(spark, recs, d, batches=3):
    for b in range(batches):
        golden_incremental(
            recs.where((F.col("rid") % batches) == b), d, b, *ARGS
        )
    return sorted(map(tuple, read_golden_state(spark, d).collect()))


def test_incremental_equals_full_recompute(spark, recs):
    d = tempfile.mkdtemp(prefix="ehs_gst_")
    try:
        assert _fold(spark, recs, d) == _full(recs)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replay_is_idempotent(spark, recs):
    d = tempfile.mkdtemp(prefix="ehs_gst_")
    try:
        before = _fold(spark, recs, d)
        # redeliver the LAST batch: v2 recomputes from v1 + batch 2
        golden_incremental(
            recs.where((F.col("rid") % 3) == 2), d, 2, *ARGS
        )
        after = sorted(map(tuple, read_golden_state(spark, d).collect()))
        assert after == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_arrival_order_invariance(spark, recs):
    """Survivorship is an argmax under a total order, so folding the
    batches in a DIFFERENT order gives the same final state."""
    d1 = tempfile.mkdtemp(prefix="ehs_gst_")
    d2 = tempfile.mkdtemp(prefix="ehs_gst_")
    try:
        a = _fold(spark, recs, d1)
        order = [2, 0, 1]
        for i, b in enumerate(order):
            golden_incremental(
                recs.where((F.col("rid") % 3) == b), d2, i, *ARGS
            )
        assert sorted(
            map(tuple, read_golden_state(spark, d2).collect())
        ) == a
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_partition_invariance(spark, recs):
    d1 = tempfile.mkdtemp(prefix="ehs_gst_")
    d2 = tempfile.mkdtemp(prefix="ehs_gst_")
    try:
        a = _fold(spark, recs, d1)
        b = _fold(spark, recs.repartition(7), d2)
        assert a == b
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_new_cluster_and_all_null_field_merge(spark, recs):
    d = tempfile.mkdtemp(prefix="ehs_gst_")
    try:
        _fold(spark, recs, d)
        state = {
            r["cluster_id"]: r.asDict()
            for r in read_golden_state(spark, d).collect()
        }
        # cluster 4 only in batch 2 (outer-join new-cluster path)
        assert state[4]["phone"] == "W-4"
        assert state[4]["bal"] is None and state[4]["bal__src_id"] is None
        # cluster 2's bal is null on every record across all batches
        assert state[2]["bal"] is None
        # cross-batch winner: cluster 1 phone from rid 11 (v=3, web)
        assert (state[1]["phone"], state[1]["phone__source"]) == (
            "W-555", "web",
        )
        assert state[1]["n_records"] == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_null_cluster_ids_merge_not_accumulate(spark, recs):
    """golden_records groups NULL cluster ids into one cluster; the
    incremental merge must too (eqNullSafe join — ADVICE r9). Fold the
    same null-cluster rows across two batches and check exactly one
    null-cluster state row that equals the full recompute."""
    nulled = recs.withColumn(
        "ck", F.when(F.col("ck") == 1, None).otherwise(F.col("ck"))
    )
    def rows(df):
        # None-safe sort key: null cluster first, then by id
        return sorted(
            map(tuple, df.collect()),
            key=lambda t: (t[0] is not None, t[0] or 0),
        )

    d = tempfile.mkdtemp(prefix="ehs_gst_null_")
    try:
        for b in range(3):
            golden_incremental(
                nulled.where((F.col("rid") % 3) == b), d, b, *ARGS
            )
        got = rows(read_golden_state(spark, d))
        assert got == rows(golden_records(nulled, *ARGS))
        n_null = sum(1 for row in got if row[0] is None)
        assert n_null == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_string_id_rejected(spark, recs):
    """Non-numeric record ids silently null the negated ordering field
    — rejected loudly (ADVICE r9), batch and incremental alike."""
    from etlhelper_spark.operators.survivorship import golden_records as gr

    bad = recs.withColumn("rid", F.col("rid").cast("string"))
    with pytest.raises(ValueError, match="numeric id"):
        gr(bad, *ARGS)
    d = tempfile.mkdtemp(prefix="ehs_gst_badid_")
    try:
        with pytest.raises(ValueError, match="numeric id"):
            golden_incremental(bad, d, 0, *ARGS)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_equals_batch(spark, recs, tmp_path):
    """Drained availableNow stream state == golden_records over the
    whole feed, with the feed split into mtime-ordered micro-batches
    (maxFilesPerTrigger=1)."""
    import glob
    import os
    import time

    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    parts_seen = set()
    t0 = time.time() - 1000
    for i in range(3):
        recs.where((F.col("rid") % 3) == i).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(feed)
        new = set(glob.glob(os.path.join(feed, "part-*"))) - parts_seen
        for p in new:
            os.utime(p, (t0 + 100 * i, t0 + 100 * i))
        parts_seen |= new
    stream = (
        spark.readStream.schema(recs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    streaming_golden(
        stream, state, str(tmp_path / "ckpt"), *ARGS
    )
    assert len(glob.glob(os.path.join(state, "golden", "v*"))) >= 2
    got = sorted(map(tuple, read_golden_state(spark, state).collect()))
    assert got == _full(recs)


def test_remap_merges_clusters_equals_recompute(spark, recs):
    """Renaming + re-merging under a cluster-merge mapping must equal
    full survivorship over the merged assignment (the associative
    argmax makes the fold exact)."""
    from etlhelper_spark.operators.survivorship_state import (
        remap_golden_clusters,
    )

    d = tempfile.mkdtemp(prefix="ehs_gst_remap_")
    try:
        _fold(spark, recs, d)
        mapping = spark.createDataFrame(
            [(1, 0), (3, 2)], "old long, new long"
        )
        remap_golden_clusters(spark, d, mapping, batch_id=10)
        merged_recs = recs.withColumn(
            "ck",
            F.when(F.col("ck") == 1, 0)
            .when(F.col("ck") == 3, 2)
            .otherwise(F.col("ck")),
        )
        got = sorted(map(tuple, read_golden_state(spark, d).collect()))
        want = sorted(
            map(tuple, golden_records(merged_recs, *ARGS).collect())
        )
        assert got == want
        # replay the remap under the same batch id: identical state
        remap_golden_clusters(spark, d, mapping, batch_id=10)
        again = sorted(map(tuple, read_golden_state(spark, d).collect()))
        assert again == got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_remap_rejects_chained_mapping(spark, recs):
    from etlhelper_spark.operators.survivorship_state import (
        remap_golden_clusters,
    )

    d = tempfile.mkdtemp(prefix="ehs_gst_chain_")
    try:
        _fold(spark, recs, d)
        chained = spark.createDataFrame(
            [(1, 0), (0, 4)], "old long, new long"
        )
        with pytest.raises(ValueError, match="chains"):
            remap_golden_clusters(spark, d, chained, batch_id=10)
        # identity rows are ignored, not flagged as chains
        ok = spark.createDataFrame(
            [(1, 0), (0, 0)], "old long, new long"
        )
        remap_golden_clusters(spark, d, ok, batch_id=11)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_resumes_after_midstream_erasure(spark, recs, tmp_path):
    """The ADVICE r11 wedge, exercised with a REAL checkpoint: drain
    a stream, erase from the golden state, append new feed files, and
    resume the SAME checkpointed stream — the engine's next assigned
    batch id must fold onto the erased state (erase epochs live
    outside the batch-id space), and the forgotten cluster must not
    resurrect. Pre-r12, the erasure consumed exactly the resumed
    stream's next id and every retry raised forever."""
    import glob
    import os
    import time

    from etlhelper_spark.operators.erasure import (
        forget_from_golden_state,
    )

    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    parts_seen = set()
    t0 = time.time() - 1000

    def land(df, i):
        nonlocal parts_seen
        df.coalesce(1).write.mode(
            "append" if os.path.isdir(feed) else "overwrite"
        ).parquet(feed)
        new = set(glob.glob(os.path.join(feed, "part-*"))) - parts_seen
        for p in new:
            os.utime(p, (t0 + 100 * i, t0 + 100 * i))
        parts_seen |= new

    first = recs.where(F.col("ck") != 4)
    for i in range(2):
        land(first.where((F.col("rid") % 2) == i), i)
    stream = (
        spark.readStream.schema(recs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    streaming_golden(stream, state, ckpt, *ARGS)
    n_before = len(glob.glob(os.path.join(state, "golden", "v*")))
    assert n_before >= 2

    # erase an entire cluster from the drained state
    doomed = [
        r["rid"]
        for r in first.where(F.col("ck") == 2).select("rid").collect()
    ]
    forget_from_golden_state(
        spark,
        state,
        doomed,
        recs.where(~F.col("rid").isin(doomed)),
        *ARGS,
        forgotten_records=first.where(F.col("ck") == 2),
    )
    assert glob.glob(os.path.join(state, "golden", "v*.e1"))

    # append NEW feed files and resume the SAME checkpoint: the
    # engine assigns the next batch id — it must apply cleanly
    land(recs.where(F.col("ck") == 4), 5)
    stream2 = (
        spark.readStream.schema(recs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    streaming_golden(stream2, state, ckpt, *ARGS)
    out = read_golden_state(spark, state)
    assert out.where(F.col("cluster_id") == 4).count() == 1
    assert out.where(F.col("cluster_id") == 2).count() == 0
