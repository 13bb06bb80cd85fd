"""Document chunking (functions/chunking.py): coverage, stride
reassembly, size budget, overlap sharing, partition invariance,
single-chunk and empty-text edges, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.chunking import chunk_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_size_budget_and_coverage(spark, docs):
    out = chunk_documents(docs, size=16, overlap=4).localCheckpoint()
    assert out.where(F.col("n_tokens") > 16).count() == 0
    assert out.where(F.col("n_tokens") <= 0).count() == 0
    # every document appears, chunk_idx dense from 0
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.min("chunk_idx").alias("lo"),
        F.max("chunk_idx").alias("hi"),
        F.max(F.col("start_tok") + F.col("n_tokens")).alias("end"),
    )
    assert per_doc.count() == docs.count()
    assert per_doc.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count() == 0
    # the last token of every doc is covered: max(start+n_tokens)
    # equals the doc's token count
    ntok = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("expect"),
    )
    bad = per_doc.join(ntok, "doc_id").where(
        F.col("end") != F.col("expect")
    )
    assert bad.count() == 0


def test_stride_reassembly_reconstructs_text(spark, docs):
    # drop the first `overlap` tokens of every chunk but the first,
    # concatenate in chunk order -> the original trimmed text
    out = chunk_documents(docs, size=16, overlap=4)
    kept = out.select(
        "doc_id",
        "chunk_idx",
        F.when(
            F.col("chunk_idx") == 0, F.col("chunk_text")
        )
        .otherwise(
            F.array_join(
                F.slice(
                    F.split(F.col("chunk_text"), r"\s+"),
                    5,
                    1 << 20,
                ),
                " ",
            )
        )
        .alias("part"),
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "part"))
            ).getField("part"),
            " ",
        ).alias("rebuilt")
    )
    orig = docs.select(
        "doc_id", F.trim(F.col("text")).alias("orig")
    )
    bad = rebuilt.join(orig, "doc_id").where(
        F.col("rebuilt") != F.col("orig")
    )
    assert bad.count() == 0


def test_overlap_shared_between_consecutive_chunks(spark, docs):
    out = chunk_documents(docs, size=16, overlap=4).localCheckpoint()
    a = out.alias("a")
    b = out.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.chunk_idx") == F.col("a.chunk_idx") + 1),
    ).select(
        F.col("a.chunk_text").alias("ta"),
        F.col("b.chunk_text").alias("tb"),
        F.col("a.n_tokens").alias("na"),
    )
    # when the left chunk is full, its last 4 tokens open the next
    bad = pairs.where(F.col("na") == 16).where(
        F.array_join(
            F.slice(F.split(F.col("ta"), r"\s+"), 13, 4), " "
        )
        != F.array_join(
            F.slice(F.split(F.col("tb"), r"\s+"), 1, 4), " "
        )
    )
    assert bad.count() == 0


def test_partition_invariance(spark, docs):
    a = sorted(
        map(tuple, chunk_documents(docs, 16, overlap=4).collect())
    )
    b = sorted(
        map(
            tuple,
            chunk_documents(
                docs.repartition(13, "text"), 16, overlap=4
            ).collect(),
        )
    )
    assert a == b


def test_short_and_empty_docs_single_chunk(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "   "), (4, "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, size=8, overlap=2).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 4  # one chunk each
    assert by_id[1]["chunk_text"] == "only three tokens"
    assert by_id[1]["n_tokens"] == 3
    # empty / all-whitespace text: split('') == [''] (the
    # token_count convention) -> one chunk of one empty token
    assert by_id[2]["n_tokens"] == 1
    assert by_id[2]["chunk_text"] == ""
    assert by_id[3]["chunk_text"] == ""
    assert by_id[4]["chunk_text"] == "x"


def test_exact_boundary_no_redundant_chunk(spark):
    # 12 tokens, size=6, overlap=2, stride=4: starts 0,4,8 -> the
    # start-10 chunk would be fully contained in start-8 and must
    # not be emitted; last chunk is exactly [8..12)
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, size=6, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["start_tok"] for r in rows] == [0, 4, 8]
    assert [r["n_tokens"] for r in rows] == [6, 6, 4]


def test_with_text_false_omits_text(spark, docs):
    out = chunk_documents(docs, size=16, overlap=4, with_text=False)
    assert out.columns == ["doc_id", "chunk_idx", "start_tok", "n_tokens"]


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="size must be positive"):
        chunk_documents(docs, size=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, size=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, size=8, overlap=-1)


def test_chunking_is_stream_native(spark, docs, tmp_path):
    """chunk_documents is a narrow map, so it runs unchanged inside
    Structured Streaming (no state, no watermark needed) — the
    continuous-ingest path chunks exactly like batch."""
    import os

    feed = str(tmp_path / "feed")
    docs.write.mode("overwrite").parquet(feed)
    stream = spark.readStream.schema(docs.schema).parquet(feed)
    out = chunk_documents(stream, size=16, overlap=4)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("chunk_stream")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("chunk_stream").collect()))
    want = sorted(
        map(tuple, chunk_documents(docs, size=16, overlap=4).collect())
    )
    assert got == want


def test_chunk_token_ids_partitions_arrays_exactly(spark):
    """chunk_token_ids: windows partition each id array exactly (no
    overlap, full coverage, order preserved), derived ids follow the
    2^20 stride, and a document past the stride raises in-plan."""
    import pytest

    from etlhelper_spark.functions.chunking import chunk_token_ids
    from etlhelper_spark.functions.util import literal_frame

    df = literal_frame(
        spark,
        [(1, list(range(7))), (2, list(range(3))), (3, [9])],
        "doc_id long, token_ids array<long>",
    )
    out = chunk_token_ids(df, size=3).collect()
    got = {
        r["chunk_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in out
    }
    assert got == {
        1 * 1048576 + 0: ([0, 1, 2], 3),
        1 * 1048576 + 1: ([3, 4, 5], 3),
        1 * 1048576 + 2: ([6], 1),
        2 * 1048576 + 0: ([0, 1, 2], 3),
        3 * 1048576 + 0: ([9], 1),
    }
    # reassembly: concatenating a doc's chunks in id order restores it
    doc1 = [
        t
        for cid in sorted(k for k in got if k < 2 * 1048576)
        for t in got[cid][0]
    ]
    assert doc1 == list(range(7))
    # stride overflow raises from the executor
    big = literal_frame(
        spark, [(5, [0] * 10)], "doc_id long, token_ids array<long>"
    )
    with pytest.raises(Exception, match="chunk_token_ids"):
        chunk_token_ids(big, size=1, stride_bits=3).collect()
