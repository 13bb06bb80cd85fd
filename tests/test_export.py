"""Training-shard export (operators/export.py): the global rank is a
true permutation, reproducible across partition counts, and the shard
layout is full-except-last with a matching manifest."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etlhelper_spark.operators.export import (
    deterministic_shuffle_rank,
    grouped_split,
    write_training_shards,
)


def _docs(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )


def test_rank_is_a_permutation(spark):
    ranked = deterministic_shuffle_rank(_docs(spark), ["doc_id"], seed=7)
    ranks = sorted(r["rank"] for r in ranked.collect())
    assert ranks == list(range(100))


def test_rank_deterministic_across_partitionings(spark):
    a = {
        r["doc_id"]: r["rank"]
        for r in deterministic_shuffle_rank(
            _docs(spark), ["doc_id"], seed=7, partitions=2
        ).collect()
    }
    b = {
        r["doc_id"]: r["rank"]
        for r in deterministic_shuffle_rank(
            _docs(spark).repartition(13), ["doc_id"], seed=7, partitions=9
        ).collect()
    }
    assert a == b


def test_rank_follows_md5_order(spark):
    rows = deterministic_shuffle_rank(
        _docs(spark, 20), ["doc_id"], seed=3
    ).collect()
    import hashlib

    def h(i):
        return hashlib.md5(f"3|{i}".encode()).hexdigest()

    expect = sorted(range(20), key=lambda i: (h(i), i))
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == expect


def test_shards_full_except_last_and_manifest(spark):
    work = tempfile.mkdtemp(prefix="ehs_export_t_")
    try:
        manifest = write_training_shards(
            _docs(spark, 103), work, ["doc_id"], rows_per_shard=25, seed=1
        )
        sizes = {r["shard"]: r["n_rows"] for r in manifest.collect()}
        assert sizes == {0: 25, 1: 25, 2: 25, 3: 25, 4: 3}
        back = spark.read.parquet(os.path.join(work, "shards"))
        assert back.count() == 103
        assert back.select("doc_id").distinct().count() == 103
        # intra-shard pos is dense 0..n-1
        pos = sorted(
            r["pos"]
            for r in back.where(F.col("shard") == 4).collect()
        )
        assert pos == [0, 1, 2]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_grouped_split_no_group_spans_splits(spark):
    # many rows per group; every group must land in exactly one split
    df = spark.range(1000).select(
        (F.col("id") % 37).alias("grp"), F.col("id").alias("row_id")
    )
    out = grouped_split(df, "grp", seed=5)
    spans = (
        out.groupBy("grp")
        .agg(F.count_distinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert spans == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_grouped_split_weights_and_determinism(spark):
    df = spark.range(5000).select(F.col("id").alias("grp"))
    a = {r["grp"]: r["split"] for r in grouped_split(df, "grp", seed=9).collect()}
    b = {
        r["grp"]: r["split"]
        for r in grouped_split(df.repartition(11), "grp", seed=9).collect()
    }
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert 0.7 < c["train"] / 5000 < 0.9
    assert 0.05 < c["val"] / 5000 < 0.15
    assert 0.05 < c["test"] / 5000 < 0.15


# ------------------------------------------------ repeat_to_budget


def test_repeat_to_budget_epochs_and_remainder(spark):
    from etlhelper_spark.functions.selection import repeat_to_budget
    from etlhelper_spark.functions.util import literal_frame

    docs = literal_frame(
        spark,
        [(1, "a", 10), (2, "a", 20), (3, "a", 30),
         (4, "b", 5), (5, "b", 5)],
        "doc_id long, source string, nt long",
    )
    # a: total 60, budget 150 -> 2 full epochs + 30-token remainder;
    # b: total 10, budget 10 -> exactly 1 full epoch, no remainder
    budgets = literal_frame(
        spark, [("a", 150), ("b", 10)],
        "source string, budget_tokens long",
    )
    out = repeat_to_budget(
        docs, budgets, tokens_col="nt"
    ).collect()
    rows = {(r["doc_id"], r["epoch"]) for r in out}
    for d in (1, 2, 3):
        assert (d, 0) in rows and (d, 1) in rows
    assert (4, 0) in rows and (5, 0) in rows
    assert not any(d in (4, 5) and e > 0 for d, e in rows)
    # partial epoch admits md5-priority docs while cum < 30
    partial = sorted(d for d, e in rows if e == 2)
    assert partial  # at least one admitted
    part_tokens = sum(
        {1: 10, 2: 20, 3: 30}[d] for d in partial
    )
    # the race admits while cum_before < 30, so the admitted prefix
    # can overshoot by at most one document
    assert part_tokens <= 60 and part_tokens >= 10
    # total planned tokens per source never exceeds budget + max doc
    tot_a = sum({1: 10, 2: 20, 3: 30}[d] for d, _e in rows if d <= 3)
    assert 150 <= tot_a <= 150 + 30
    # deterministic: same plan on a different partitioning
    again = {
        (r["doc_id"], r["epoch"])
        for r in repeat_to_budget(
            docs.repartition(7), budgets, tokens_col="nt"
        ).collect()
    }
    assert again == rows


def test_repeat_to_budget_sub_size_budget_is_pure_race(spark):
    from etlhelper_spark.functions.selection import repeat_to_budget
    from etlhelper_spark.functions.util import literal_frame

    docs = literal_frame(
        spark,
        [(1, "a", 10), (2, "a", 20), (3, "a", 30)],
        "doc_id long, source string, nt long",
    )
    budgets = literal_frame(
        spark, [("a", 25)], "source string, budget_tokens long"
    )
    out = repeat_to_budget(docs, budgets, tokens_col="nt").collect()
    assert all(r["epoch"] == 0 for r in out)
    assert 0 < len(out) < 3  # a strict subset admitted


def test_repeat_to_budget_raises_on_unmatched_source(spark):
    """The quota join is loud, not silent (ADVICE r11): a corpus
    source with no budget row, a budget row naming no corpus source
    (the typo'd quota line), or a NULL budget fails the job instead
    of quietly planning zero epochs for that source."""
    import pytest

    from etlhelper_spark.functions.selection import repeat_to_budget
    from etlhelper_spark.functions.util import literal_frame

    docs = literal_frame(
        spark,
        [(1, "a", 10), (2, "b", 20)],
        "doc_id long, source string, nt long",
    )
    shapes = {
        "budget-only source": [("a", 30), ("b", 40), ("zz", 5)],
        "missing budget row": [("a", 30)],
        "null budget": [("a", 30), ("b", None)],
    }
    for name, rows in shapes.items():
        budgets = literal_frame(
            spark, rows, "source string, budget_tokens long"
        )
        with pytest.raises(Exception, match="repeat_to_budget"):
            repeat_to_budget(docs, budgets, tokens_col="nt").count()


def test_repeat_to_budget_bucket_count_invariance(spark):
    """The two-level race is exact for ANY bucket count: the bucket
    map is a monotone function of the race order, so admissions are
    identical at 1 bucket (degenerate: the old per-source window),
    the default 4096, and the 65536 max."""
    from etlhelper_spark.functions.selection import repeat_to_budget
    from etlhelper_spark.functions.util import literal_frame

    docs = literal_frame(
        spark,
        [(i, "s" if i % 3 else "t", 7 + i % 11) for i in range(1, 80)],
        "doc_id long, source string, nt long",
    )
    budgets = literal_frame(
        spark,
        [("s", 1500), ("t", 400)],
        "source string, budget_tokens long",
    )
    plans = []
    for nb in (1, 4096, 65536):
        plans.append(
            sorted(
                (r["doc_id"], r["epoch"])
                for r in repeat_to_budget(
                    docs, budgets, tokens_col="nt", partial_buckets=nb
                ).collect()
            )
        )
    assert plans[0] == plans[1] == plans[2]
