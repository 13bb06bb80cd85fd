"""Frozen-BPE-state contract: train once, encode forever, identically."""

import pytest

from etlhelper_spark.operators.bpe_state import (
    apply_bpe_state,
    build_bpe_state,
    read_bpe_merges,
)


@pytest.fixture()
def train_df(spark):
    # "ab" dominates: merge 1 = (a,b); then "abc" dominates round 2
    return spark.createDataFrame(
        [(i, "abc abc abd xy") for i in range(6)],
        ["doc_id", "text"],
    )


def test_frozen_apply_matches_manual_rules(spark, train_df, tmp_path):
    state = str(tmp_path / "bpe")
    build_bpe_state(train_df, state, rounds=2)
    rules = [
        (r["left"], r["right"])
        for r in read_bpe_merges(spark, state).collect()
    ]
    assert rules == [("a", "b"), ("ab", "c")]

    new = spark.createDataFrame(
        [(0, "abc abd zz ab")], ["doc_id", "text"]
    )
    enc = {
        r["w"]: r["n_sub"]
        for r in apply_bpe_state(new, state).collect()
    }
    # abc -> [abc] (both rules), abd -> [ab, d], zz -> [z, z], ab -> [ab]
    assert enc == {"abc": 1, "abd": 2, "zz": 2, "ab": 1}


def test_rebuild_is_idempotent(spark, train_df, tmp_path):
    state = str(tmp_path / "bpe")
    build_bpe_state(train_df, state, rounds=2)
    first = sorted(
        map(tuple, read_bpe_merges(spark, state).collect())
    )
    build_bpe_state(train_df, state, rounds=2)  # replay
    assert (
        sorted(map(tuple, read_bpe_merges(spark, state).collect()))
        == first
    )


def test_missing_state_is_a_clear_error(spark, tmp_path):
    with pytest.raises(ValueError, match="no persisted merges"):
        read_bpe_merges(spark, str(tmp_path / "nope"))
