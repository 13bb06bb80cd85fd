"""Incremental inverted-index state (operators/index_state.py):
sequential applies equal the batch recompute, replay is idempotent,
and stats merge exactly across batches."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.operators.index_state import (
    inverted_index_incremental,
    read_index_top,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def state_dir():
    d = tempfile.mkdtemp(prefix="ehs_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(
        (r["token"], r["df"], r["cf"], tuple(r["postings"]))
        for r in df.collect()
    )


def test_three_batches_equal_batch_recompute(spark, state_dir):
    from etlhelper_spark.plans.queries import q160_inverted_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    for i in range(3):
        inverted_index_incremental(
            docs.where(F.pmod("doc_id", F.lit(3)) == i), state_dir, i
        )
    got = _rows(read_index_top(spark, state_dir, k=50, postings_cap=20))
    want = _rows(q160_inverted_index(spark, SF_DIR))
    assert got == want and got


def test_postings_compaction_stays_readable(spark, state_dir):
    """compact_dedup_state on the postings store folds the batch dirs
    into base; read_index_top must serve identical output from the
    compacted layout (the generic state reader unions base+appends)."""
    from etlhelper_spark.operators.dedup_state import compact_dedup_state

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    for i in range(2):
        inverted_index_incremental(
            docs.where(F.pmod("doc_id", F.lit(2)) == i), state_dir, i
        )
    before = _rows(read_index_top(spark, state_dir, k=30))
    folded = compact_dedup_state(spark, state_dir, "postings")
    assert folded == 2
    assert _rows(read_index_top(spark, state_dir, k=30)) == before


def test_replay_is_idempotent(spark, state_dir):
    b0 = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame([(3, "alpha delta")], ["doc_id", "text"])
    inverted_index_incremental(b0, state_dir, 0)
    inverted_index_incremental(b1, state_dir, 1)
    first = _rows(read_index_top(spark, state_dir, k=10))
    # replay batch 1: postings dir and stats version both overwrite
    inverted_index_incremental(b1, state_dir, 1)
    assert _rows(read_index_top(spark, state_dir, k=10)) == first
    stats = {r["token"]: (r["df"], r["cf"]) for r in
             read_index_top(spark, state_dir, k=10).select(
                 "token", "df", "cf").collect()}
    assert stats["alpha"] == (2, 3)
    assert stats["beta"] == (2, 2)
    assert stats["delta"] == (1, 1)
