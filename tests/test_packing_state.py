"""Incremental packing state (operators/packing_state.py):
incremental-equals-batch, replay idempotence, cursor continuation,
empty batches, parameter-drift rejection."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.packing import pack_documents
from etlhelper_spark.operators.packing_state import (
    pack_incremental,
    read_pack_assignments,
    read_pack_cursor,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )


@pytest.fixture()
def work():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batches(docs):
    return [
        (b + 1, docs.where(F.pmod("doc_id", F.lit(3)) == b))
        for b in range(3)
    ]


def test_incremental_equals_batch(spark, docs, work):
    for bid, part in _batches(docs):
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    got = sorted(
        map(tuple, read_pack_assignments(spark, work).collect())
    )
    # full recompute: one corpus ordered by (batch, id)
    ordered = docs.withColumn(
        "b", (F.pmod("doc_id", F.lit(3)) + 1).cast("int")
    )
    want = sorted(
        map(
            tuple,
            pack_documents(
                ordered, budget=256, n_shards=8, order_col="b"
            ).collect(),
        )
    )
    assert got == want


def test_replay_idempotent(spark, docs, work):
    batches = _batches(docs)
    for bid, part in batches:
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    before = sorted(
        map(tuple, read_pack_assignments(spark, work).collect())
    )
    cur_before = sorted(
        map(tuple, read_pack_cursor(spark, work).collect())
    )
    # redeliver batch 2: reads v1, recomputes the identical v2
    pack_incremental(
        batches[1][1], work, batch_id=2, budget=256, n_shards=8
    )
    after = sorted(
        map(tuple, read_pack_assignments(spark, work).collect())
    )
    assert before == after
    assert cur_before == sorted(
        map(tuple, read_pack_cursor(spark, work).collect())
    )


def test_cursor_continuation_and_empty_batch(spark, work):
    df1 = spark.createDataFrame(
        [(0, 100), (1, 100)], "doc_id long, n long"
    )
    pack_incremental(
        df1, work, batch_id=1, budget=256, tokens_col="n", n_shards=2
    )
    cur = {
        r["shard"]: r for r in read_pack_cursor(spark, work).collect()
    }
    assert cur[0]["fill"] == 100 and cur[0]["started"] is True
    # empty batch: cursors carry forward untouched
    pack_incremental(
        df1.where(F.lit(False)),
        work,
        batch_id=2,
        budget=256,
        tokens_col="n",
        n_shards=2,
    )
    cur2 = {
        r["shard"]: r for r in read_pack_cursor(spark, work).collect()
    }
    assert {s: (r["pack_local"], r["fill"], r["started"]) for s, r in cur.items()} == {
        s: (r["pack_local"], r["fill"], r["started"]) for s, r in cur2.items()
    }
    # batch 3 continues the open pack: doc of 150 tokens fits pack 0
    # of shard 0 (fill 100 + 150 <= 256) at offset 100
    df3 = spark.createDataFrame([(4, 150)], "doc_id long, n long")
    out = pack_incremental(
        df3, work, batch_id=3, budget=256, tokens_col="n", n_shards=2
    ).collect()
    assert len(out) == 1
    assert out[0]["pack_id"] == 0 and out[0]["offset"] == 100
    # and a doc that does NOT fit opens pack 1
    df4 = spark.createDataFrame([(6, 100)], "doc_id long, n long")
    out4 = pack_incremental(
        df4, work, batch_id=4, budget=256, tokens_col="n", n_shards=2
    ).collect()
    assert out4[0]["pack_id"] == 1 and out4[0]["offset"] == 0


def test_parameter_drift_rejected(spark, docs, work):
    pack_incremental(
        docs.limit(10), work, batch_id=1, budget=256, n_shards=8
    )
    with pytest.raises(ValueError, match="parameter drift"):
        pack_incremental(
            docs.limit(10), work, batch_id=2, budget=128, n_shards=8
        )
    with pytest.raises(ValueError, match="parameter drift"):
        pack_incremental(
            docs.limit(10), work, batch_id=2, budget=256, n_shards=4
        )


def test_validation(spark, work):
    df = spark.createDataFrame([("a", 1)], "doc_id string, n long")
    with pytest.raises(ValueError, match="numeric id"):
        pack_incremental(
            df, work, batch_id=1, budget=10, tokens_col="n"
        )
    df2 = spark.createDataFrame([(1, 1)], "doc_id long, n long")
    with pytest.raises(ValueError, match="oversize"):
        pack_incremental(
            df2, work, batch_id=1, budget=10, tokens_col="n",
            oversize="truncate",
        )


def test_forget_from_pack_state(spark, docs, work):
    from etlhelper_spark.operators.packing_state import (
        forget_from_pack_state,
    )

    for bid, part in _batches(docs):
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    all_before = {
        r["doc_id"]: r
        for r in read_pack_assignments(spark, work).collect()
    }
    doomed = sorted(all_before)[:5] + [sorted(all_before)[-1]]
    n = forget_from_pack_state(spark, work, doomed)
    assert n == len(doomed)
    after = {
        r["doc_id"]: r
        for r in read_pack_assignments(spark, work).collect()
    }
    assert set(after) == set(all_before) - set(doomed)
    # every retained document keeps its exact address (holes, not
    # repacking)
    for k, r in after.items():
        b = all_before[k]
        assert (r["pack_id"], r["offset"]) == (
            b["pack_id"],
            b["offset"],
        )
    # idempotent: erasing again removes nothing
    assert forget_from_pack_state(spark, work, doomed) == 0


def test_erase_is_sticky_across_replay(spark, docs, work):
    from etlhelper_spark.operators.packing_state import (
        forget_from_pack_state,
    )

    batches = _batches(docs)
    for bid, part in batches:
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    victim = batches[1][1].select("doc_id").first()["doc_id"]
    forget_from_pack_state(spark, work, [victim])
    # at-least-once redelivery of the erased batch must NOT
    # resurrect the forgotten row: the erase epoch outranks v2
    pack_incremental(
        batches[1][1], work, batch_id=2, budget=256, n_shards=8
    )
    ids = {
        r["doc_id"]
        for r in read_pack_assignments(spark, work).collect()
    }
    assert victim not in ids


def test_crash_window_partial_epoch_invisible(spark, docs, work):
    import os

    for bid, part in _batches(docs):
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    before = sorted(
        map(tuple, read_pack_assignments(spark, work).collect())
    )
    # a crashed erase write: epoch dir exists but has no _SUCCESS
    fake = os.path.join(work, "assign", "v1.e1")
    os.makedirs(fake)
    assert (
        sorted(
            map(tuple, read_pack_assignments(spark, work).collect())
        )
        == before
    )


def test_forget_everywhere_covers_pack_state(spark, docs, work):
    from etlhelper_spark.operators.erasure import forget_everywhere

    for bid, part in _batches(docs):
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    victim = int(docs.select("doc_id").first()["doc_id"])
    out = forget_everywhere(spark, [victim], pack_state_dir=work)
    assert out["pack_assignments"] == 1


def test_streaming_pack_equals_batch(spark, docs, work, tmp_path):
    """Drained streaming assignments equal the single-corpus packing
    ordered by (micro-batch, id) — the order-sensitivity contract."""
    import glob as _glob
    import os
    import time

    from etlhelper_spark.operators.packing_state import streaming_pack

    feed = os.path.join(work, "feed")
    parts_seen = set()
    t0 = time.time() - 1000
    for i in (0, 1):
        docs.where(F.pmod("doc_id", F.lit(2)) == i).coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(feed)
        new = set(_glob.glob(os.path.join(feed, "part-*"))) - parts_seen
        for p in new:
            os.utime(p, (t0 + 100 * i, t0 + 100 * i))
        parts_seen |= new
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    state = os.path.join(work, "state")
    streaming_pack(
        stream, state, str(tmp_path / "ck"), budget=256, n_shards=8
    )
    got = sorted(
        map(tuple, read_pack_assignments(spark, state).collect())
    )
    ordered = docs.withColumn(
        "b", F.pmod("doc_id", F.lit(2)).cast("int")
    )
    want = sorted(
        map(
            tuple,
            pack_documents(
                ordered, budget=256, n_shards=8, order_col="b"
            ).collect(),
        )
    )
    assert got == want


def test_replay_after_erase_leaves_no_bytes_behind(spark, docs, work):
    """The review-confirmed resurrection hole: a replay of an erased
    batch must not leave a raw v<batch> dir containing forgotten
    rows. Since the ADVICE r10 fix the epoch check runs BEFORE the
    assignment write, so the raw dir is never created even
    transiently (the old shape wrote it and rmtree'd after — a crash
    inside that window retained forgotten bytes)."""
    import glob
    import os

    from etlhelper_spark.operators.packing_state import (
        forget_from_pack_state,
    )

    batches = _batches(docs)
    for bid, part in batches:
        pack_incremental(
            part, work, batch_id=bid, budget=256, n_shards=8
        )
    victim = batches[1][1].select("doc_id").first()["doc_id"]
    forget_from_pack_state(spark, work, [victim])
    # redeliver batch 2: the returned assignments are the erased
    # epoch's, and no raw v2 dir survives on disk
    out = pack_incremental(
        batches[1][1], work, batch_id=2, budget=256, n_shards=8
    )
    assert out.where(F.col("doc_id") == victim).count() == 0
    dirs = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(work, "assign", "v*"))
    }
    assert "v2" not in dirs and "v2.e1" in dirs
    # and the forgotten id appears in NO parquet bytes under assign/
    for p in glob.glob(os.path.join(work, "assign", "v*")):
        found = (
            spark.read.parquet(p)
            .where(F.col("doc_id") == victim)
            .count()
        )
        assert found == 0, p


def test_id_col_drift_rejected(spark, work):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    pack_incremental(
        df, work, batch_id=1, budget=64, tokens_col="n", n_shards=2
    )
    df2 = spark.createDataFrame([(2, 5)], "chunk_id long, n long")
    with pytest.raises(ValueError, match="parameter drift"):
        pack_incremental(
            df2,
            work,
            batch_id=2,
            budget=64,
            tokens_col="n",
            n_shards=2,
            id_col="chunk_id",
        )


def test_duplicate_ids_rejected_in_batch(spark, work):
    from pyspark.errors.exceptions.captured import PythonException

    dup = spark.createDataFrame(
        [(1, "a b"), (1, "c d")], "doc_id long, text string"
    )
    with pytest.raises(PythonException, match="duplicate id"):
        pack_incremental(dup, work, 1, budget=64, n_shards=2)


def test_fractional_ids_rejected(spark, work):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    frac = spark.createDataFrame(
        [(2.0, "a b"), (2.5, "c d")], "doc_id double, text string"
    )
    with pytest.raises(SparkRuntimeException, match="non-integral id"):
        pack_incremental(frac, work, 1, budget=64, n_shards=2)
    # integral doubles pass: 2.0 stores as id 2
    ok = spark.createDataFrame(
        [(2.0, "a b"), (3.0, "c d")], "doc_id double, text string"
    )
    out = pack_incremental(ok, work, 2, budget=64, n_shards=2)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]
