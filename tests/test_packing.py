"""Sequence packing (functions/packing.py): budget invariant, exactly-
once coverage, running-sum offsets, partition invariance, oversize
modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.packing import pack_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_budget_and_exactly_once(spark, docs):
    out = pack_documents(docs, budget=256, n_shards=8).localCheckpoint()
    n_docs = docs.count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # no pack exceeds the budget
    over = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .where(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    # packs never cross shards: pack_id >> 32 recovers the shard
    crossed = out.where(
        F.expr("shiftright(pack_id, 32)") != F.col("shard")
    ).count()
    assert crossed == 0


def test_offsets_are_running_sums(spark, docs):
    out = pack_documents(docs, budget=256, n_shards=8)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("pack_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bad = out.withColumn(
        "expect", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).where(F.col("expect") != F.col("offset"))
    assert bad.count() == 0


def test_partition_invariance(spark, docs):
    a = sorted(
        map(tuple, pack_documents(docs, 256, n_shards=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_documents(docs.repartition(13), 256, n_shards=8).collect(),
        )
    )
    assert a == b


def test_oversize_modes(spark):
    rows = [(i, "tok " * n) for i, n in [(1, 5), (2, 40), (3, 6)]]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(Exception, match="tokens > budget"):
        pack_documents(d, budget=16, n_shards=1).collect()
    kept = pack_documents(d, budget=16, n_shards=1, oversize="drop")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    own = pack_documents(
        d, budget=16, n_shards=1, oversize="own_pack"
    ).collect()
    by_id = {r.doc_id: r for r in own}
    # the oversized doc sits alone in its own pack
    assert by_id[2].pack_id not in (by_id[1].pack_id, by_id[3].pack_id)
    assert by_id[2].offset == 0


def test_precomputed_tokens_col_and_validation(spark, docs):
    pre = docs.withColumn("nt", F.size(F.split(F.trim("text"), r"\s+")))
    out = pack_documents(pre, 256, tokens_col="nt", n_shards=4)
    assert out.count() == docs.count()
    with pytest.raises(ValueError, match="numeric id"):
        pack_documents(
            docs.withColumn("doc_id", F.col("doc_id").cast("string")), 256
        )
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, 0)
    with pytest.raises(ValueError, match="oversize"):
        pack_documents(docs, 256, oversize="truncate")


def test_order_col_packs_in_stated_order(spark, docs):
    # longest-first: __ord = -n_tokens, so next-fit sees a descending
    # length stream (FFD-style); all invariants must still hold
    pre = docs.withColumn(
        "nt", F.size(F.split(F.trim("text"), r"\s+"))
    ).withColumn("neg", -F.col("nt"))
    out = pack_documents(
        pre, 256, tokens_col="nt", n_shards=8, order_col="neg"
    ).localCheckpoint()
    assert out.count() == docs.count()
    over = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .where(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    # within a pack, offsets must follow DESCENDING token counts —
    # the stated order, not id order
    from pyspark.sql.window import Window

    w = Window.partitionBy("pack_id").orderBy("offset")
    bad = (
        out.withColumn("prev", F.lag("n_tokens").over(w))
        .where(F.col("prev").isNotNull() & (F.col("prev") < F.col("n_tokens")))
        .count()
    )
    assert bad == 0
    # deterministic under repartitioning
    again = pack_documents(
        pre.repartition(11), 256, tokens_col="nt", n_shards=8,
        order_col="neg",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


# ------------------------------------------------- packed tensor export


@pytest.fixture(scope="module")
def tok_docs(spark, docs):
    from etlhelper_spark.functions.text import bpe_doc_token_ids

    return bpe_doc_token_ids(
        docs.where(F.col("doc_id") < 300), rounds=2
    ).localCheckpoint()


def _windows(tok_docs, budget=512, pad=-1):
    from etlhelper_spark.functions.packing import (
        pack_documents,
        pack_token_windows,
    )

    asg = pack_documents(
        tok_docs, budget=budget, tokens_col="n_tokens", n_shards=4
    )
    return pack_token_windows(tok_docs, asg, budget=budget, pad_id=pad)


def test_windows_fixed_length_and_consumed_tokens(spark, tok_docs):
    """Every window is EXACTLY budget long, and the unpadded prefix
    length equals the manifest's consumed tokens (the VERDICT r10 #3
    property: concatenated unpadded lengths == pack_tokens)."""
    win = _windows(tok_docs).localCheckpoint()
    bad = win.where(F.size("input_ids") != 512).count()
    assert bad == 0
    # pad is a strict suffix: first pad position == pack_tokens, and
    # no pad id appears before it
    probe = win.select(
        "pack_id",
        "pack_tokens",
        F.size(F.slice("input_ids", 1, F.col("pack_tokens").cast("int")))
        .alias("body_len"),
        F.size(
            F.filter(
                F.slice("input_ids", 1, F.col("pack_tokens").cast("int")),
                lambda x: x == F.lit(-1),
            )
        ).alias("pads_in_body"),
        F.size(
            F.filter(
                F.slice(
                    "input_ids",
                    F.col("pack_tokens").cast("int") + 1,
                    (F.lit(512) - F.col("pack_tokens")).cast("int"),
                ),
                lambda x: x != F.lit(-1),
            )
        ).alias("nonpads_in_tail"),
    )
    assert (
        probe.where(
            (F.col("pads_in_body") > 0) | (F.col("nonpads_in_tail") > 0)
        ).count()
        == 0
    )
    # global conservation: sum of pack_tokens == sum of doc n_tokens
    assert (
        win.agg(F.sum("pack_tokens")).first()[0]
        == tok_docs.agg(F.sum("n_tokens")).first()[0]
    )


def test_windows_concatenate_docs_in_offset_order(spark, tok_docs):
    win = _windows(tok_docs)
    from etlhelper_spark.functions.packing import pack_documents

    asg = pack_documents(
        tok_docs, budget=512, tokens_col="n_tokens", n_shards=4
    )
    # reassembly: slicing each doc's [offset, offset+n_tokens) span out
    # of its window must reproduce the doc's own token_ids exactly
    joined = (
        asg.join(win.select("pack_id", "input_ids"), "pack_id")
        .join(tok_docs.select("doc_id", "token_ids"), "doc_id")
        .select(
            "doc_id",
            F.slice(
                "input_ids",
                F.col("offset").cast("int") + 1,
                F.col("n_tokens").cast("int"),
            ).alias("got"),
            "token_ids",
        )
    )
    assert joined.where(F.col("got") != F.col("token_ids")).count() == 0


def test_windows_reject_vintage_mismatch(spark, tok_docs):
    """token_ids arrays encoded under a DIFFERENT vintage than the
    counts that drove packing must fail loudly, never pack ragged."""
    from etlhelper_spark.functions.packing import (
        pack_documents,
        pack_token_windows,
    )
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    asg = pack_documents(
        tok_docs, budget=512, tokens_col="n_tokens", n_shards=4
    )
    drifted = tok_docs.select(
        "doc_id", F.slice("token_ids", 1, 1).alias("token_ids")
    )
    with pytest.raises(SparkRuntimeException, match="tokenizer vintage"):
        pack_token_windows(drifted, asg, budget=512).collect()


def test_windows_reject_over_budget_pack(spark, tok_docs):
    from etlhelper_spark.functions.packing import (
        pack_documents,
        pack_token_windows,
    )
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    asg = pack_documents(
        tok_docs,
        budget=512,
        tokens_col="n_tokens",
        n_shards=4,
        oversize="own_pack",
    )
    # shrink the budget below some pack's load: own_pack packs have no
    # fixed-length tensor form and must raise
    big = asg.agg(
        F.max(F.col("offset") + F.col("n_tokens"))
    ).first()[0]
    with pytest.raises(SparkRuntimeException, match="budget"):
        pack_token_windows(
            tok_docs, asg, budget=int(big) - 1
        ).collect()


def test_write_packed_tensors_round_trips(spark, tok_docs, tmp_path):
    from etlhelper_spark.operators.export import write_packed_tensors

    win = _windows(tok_docs).localCheckpoint()
    out = str(tmp_path / "tensors")
    manifest = write_packed_tensors(win, out, rows_per_shard=16)
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == win.count()
    # fixed length survives the round trip; pack provenance kept
    assert back.where(F.size("input_ids") != 512).count() == 0
    assert "pack_shard" in back.columns and "pos" in back.columns
    # manifest agrees with the physical shards
    sizes = {
        r["shard"]: r["n_rows"]
        for r in back.groupBy("shard").count().withColumnRenamed(
            "count", "n_rows"
        ).collect()
    }
    assert {
        r["shard"]: r["n_rows"] for r in manifest.collect()
    } == sizes
    # every full shard is exactly full
    full = [n for s, n in sorted(sizes.items())[:-1]]
    assert all(n == 16 for n in full)


def test_doc_token_ids_frozen_merges_match_in_engine(spark, docs, tmp_path):
    """bpe_doc_token_ids under FROZEN persisted rules equals the
    in-engine-trained encoding when the rules came from the same
    corpus — the tokenizer-vintage contract."""
    from etlhelper_spark.functions.text import bpe_doc_token_ids
    from etlhelper_spark.operators.bpe_state import (
        build_bpe_state,
        read_bpe_merges,
    )

    small = docs.where(F.col("doc_id") < 120)
    st = str(tmp_path / "bpe")
    build_bpe_state(small, st, rounds=2)
    rules = read_bpe_merges(spark, st).collect()
    frozen = bpe_doc_token_ids(small, rounds=0, merges=rules)
    trained = bpe_doc_token_ids(small, rounds=2)
    assert sorted(map(tuple, frozen.collect())) == sorted(
        map(tuple, trained.collect())
    )


def test_duplicate_ids_rejected(spark):
    from pyspark.errors.exceptions.captured import PythonException

    dup = spark.createDataFrame(
        [(1, 5), (2, 5), (1, 5)], "doc_id long, nt long"
    )
    with pytest.raises(PythonException, match="duplicate packing key"):
        pack_documents(dup, 64, tokens_col="nt", n_shards=2).collect()


def test_window_metadata_segments_and_positions(spark, tok_docs):
    from etlhelper_spark.functions.packing import (
        pack_documents,
        pack_token_windows,
    )

    asg = pack_documents(
        tok_docs, budget=512, tokens_col="n_tokens", n_shards=4
    )
    win = pack_token_windows(
        tok_docs, asg, budget=512, with_metadata=True
    ).localCheckpoint()
    rows = win.collect()
    for r in rows:
        ids, segs, poss = (
            r["input_ids"], r["segment_ids"], r["position_ids"]
        )
        assert len(ids) == len(segs) == len(poss) == 512
        body = r["pack_tokens"]
        # pad tail is -1 on ALL THREE arrays; body has no -1 seg/pos
        assert all(s == -1 and p == -1 for s, p in
                   zip(segs[body:], poss[body:]))
        assert all(s >= 0 and p >= 0 for s, p in
                   zip(segs[:body], poss[:body]))
        # segments are 0..n_docs-1, non-decreasing, and positions
        # restart at 0 exactly at each segment boundary
        assert segs[0] == 0 and poss[0] == 0
        for i in range(1, body):
            assert segs[i] - segs[i - 1] in (0, 1)
            if segs[i] != segs[i - 1]:
                assert poss[i] == 0
            else:
                assert poss[i] == poss[i - 1] + 1
        assert segs[body - 1] == r["n_docs"] - 1


def test_windows_reject_missing_document(spark, tok_docs):
    """An assigned document missing from doc_tokens must raise, never
    silently drop from its window (the offsets of every later
    document in the pack would be wrong)."""
    from etlhelper_spark.functions.packing import (
        pack_documents,
        pack_token_windows,
    )
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    asg = pack_documents(
        tok_docs, budget=512, tokens_col="n_tokens", n_shards=4
    )
    some_id = tok_docs.select("doc_id").first()["doc_id"]
    holey = tok_docs.where(F.col("doc_id") != some_id)
    with pytest.raises(SparkRuntimeException, match="no token_ids row"):
        pack_token_windows(holey, asg, budget=512).collect()


def test_pack_token_windows_stale_assignments_raise(spark):
    """Reverse membership gate (ADVICE r11): an encoded document with
    no pack assignment — a stale assignment table — raises instead of
    silently vanishing from the tensors; check_unassigned=False opts
    into the drop; duplicate assignment rows also trip the gate."""
    import pytest

    from etlhelper_spark.functions.packing import (
        pack_documents,
        pack_token_windows,
    )
    from etlhelper_spark.functions.util import literal_frame

    dt = literal_frame(
        spark,
        [(1, [10, 11]), (2, [20]), (3, [30, 31, 32])],
        "doc_id long, token_ids array<long>",
    )
    # assignments built BEFORE doc 3 was encoded (stale)
    asg = pack_documents(
        dt.where("doc_id < 3").select(
            "doc_id", F.size("token_ids").cast("long").alias("n_tokens")
        ),
        budget=8,
        tokens_col="n_tokens",
        n_shards=1,
    )
    with pytest.raises(Exception, match="stale"):
        pack_token_windows(dt, asg, budget=8).collect()
    # opting out drops doc 3 knowingly, keeps 1 and 2
    out = pack_token_windows(
        dt, asg, budget=8, check_unassigned=False
    ).collect()
    assert sum(r["n_docs"] for r in out) == 2
    # duplicate assignment rows (negative count diff) also raise
    dup = asg.unionByName(asg.limit(1))
    with pytest.raises(Exception, match="duplicate|stale"):
        pack_token_windows(
            dt.where("doc_id < 3"), dup, budget=8
        ).collect()
