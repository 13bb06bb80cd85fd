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


def test_frozen_vocab_unk_and_loud_paths(spark, tmp_path):
    from etlhelper_spark.functions.text import bpe_doc_token_ids
    from etlhelper_spark.operators.bpe_state import (
        build_bpe_state,
        read_bpe_merges,
        read_bpe_vocab,
    )
    from etlhelper_spark.functions.util import literal_frame
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    train = literal_frame(
        spark,
        [(1, "aa ab ba"), (2, "ab ab aa")],
        "doc_id long, text string",
    )
    st = str(tmp_path / "bpe")
    build_bpe_state(train, st, rounds=2, with_vocab=True)
    rules = read_bpe_merges(spark, st).collect()
    vocab = read_bpe_vocab(spark, st)
    # 'z' never appeared in training: unk_id substitutes...
    newbatch = literal_frame(
        spark, [(9, "az ab")], "doc_id long, text string"
    )
    out = bpe_doc_token_ids(
        newbatch, merges=rules, vocab=vocab, unk_id=-2
    ).first()
    assert -2 in out["token_ids"]
    # ...and the no-unk default fails loudly
    with pytest.raises(SparkRuntimeException, match="frozen vocab"):
        bpe_doc_token_ids(
            newbatch, merges=rules, vocab=vocab
        ).collect()
    # a batch fully inside the vintage encodes identically to the
    # derive-ids-from-self path ONLY when the subword sets coincide;
    # under the frozen state the ids come from the FROZEN table
    seen = bpe_doc_token_ids(
        train, merges=rules, vocab=vocab
    )
    vmap = {r["sym"]: r["tok_id"] for r in vocab.collect()}
    assert seen.count() == 2 and len(vmap) > 0


def test_build_with_vocab_matches_legacy_merges(spark, tmp_path):
    """The with_vocab build trains through the same loop as the
    legacy path: identical merge tables."""
    from etlhelper_spark.functions.text import bpe_merges
    from etlhelper_spark.operators.bpe_state import (
        build_bpe_state,
        read_bpe_merges,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").where("doc_id < 100")
    st = str(tmp_path / "bpe")
    build_bpe_state(docs, st, rounds=3, with_vocab=True)
    got = sorted(map(tuple, read_bpe_merges(spark, st).collect()))
    want = sorted(map(tuple, bpe_merges(docs, rounds=3).collect()))
    assert got == want
