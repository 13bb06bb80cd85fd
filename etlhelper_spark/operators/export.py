"""Training-data export: deterministic global shuffle + fixed-size
shard assignment — the last step of a 100 TB pipeline, where the
curated corpus must leave Spark as a reproducible sequence of
size-bounded shards a training job can stream.

Why not ``ORDER BY rand()``: training-data order must be REPRODUCIBLE
(same seed → same shard layout, across runs, engines, and cluster
sizes) or no experiment is repeatable. The shuffle key here is
``md5(seed || business key)`` — content-derived, so the permutation is
a pure function of the data + seed (the q67 held-out-split primitive
applied to ordering).

Why not ``row_number() OVER (ORDER BY h)``: a global window collapses
the corpus into ONE partition — the classic 100 TB anti-pattern. The
global rank is instead the two-phase distributed prefix sum (the
ks_2samp shape in functions/drift.py): range-repartition on the
shuffle key, sort within partitions, collect ONE row per partition
(the counts), broadcast running offsets back, and add
``offset + local index`` in a single Arrow-batched pass. Driver
traffic is O(partitions); no stage ever holds more than its range.

Shard = rank // rows_per_shard: every shard except the last is
exactly full, shard contents and intra-shard order are deterministic,
and the physical write is ``partitionBy(shard)`` so each shard lands
as its own directory a data loader can address.

Reference parity note: the reference (a DB-API cursor wrapper,
/root/reference/etlhelper/etl.py) exports via executemany into DB
tables; this is the Spark-native bulk-export counterpart for
training-shard layouts.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.util import read_parquet_state

__all__ = [
    "deterministic_shuffle_rank",
    "grouped_split",
    "write_packed_tensors",
    "write_training_shards",
]


def grouped_split(
    df: DataFrame,
    group_col: str,
    weights: Sequence[tuple[str, int]] = (
        ("train", 80),
        ("val", 10),
        ("test", 10),
    ),
    seed: int = 0,
) -> DataFrame:
    """Leakage-free train/val/test assignment: the split is a pure
    function of the GROUP key (md5(seed || group) mod 100 against
    cumulative weight boundaries), so every row of a group lands in
    the same split BY CONSTRUCTION — near-duplicates that share the
    group (a user's events, a domain's pages, a cluster's docs) can
    never straddle the train/eval boundary, which is the leakage that
    row-level rand() splits silently commit. Content-hashed like the
    q67 sampling primitive: reproducible across runs, engines, and
    partitionings; one projection, no shuffle, no state."""
    total = sum(w for _, w in weights)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(str(int(seed))),
                        F.col(group_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % total
    )
    expr = None
    cum = 0
    for name, w in weights:
        cum += w
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def deterministic_shuffle_rank(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based global ``rank`` in md5(seed || key) order —
    a reproducible global shuffle. Ties (only possible on duplicate
    business keys) break by the key columns themselves, so the rank
    is a total order whenever the key is unique. Cost: one shuffle
    (the range repartition), O(partitions) driver rows, one
    Arrow-batched pass; the corpus is never single-partitioned."""
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    key = F.concat_ws(
        "|", F.lit(str(int(seed))), *[F.col(c).cast("string") for c in key_cols]
    )
    order_cols = ["_h", *key_cols]
    ordered = (
        df.withColumn("_h", F.md5(key))
        .repartitionByRange(partitions, *[F.asc(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets = {}
    running = 0
    for r in counts:
        offsets[int(r["_pid"])] = running
        running += int(r["n"])

    out_fields = df.schema.fields
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", rank long"
    )
    out_names = [f.name for f in out_fields]

    def _add_rank(batches):
        start = None
        for pdf in batches:
            if pdf.empty:
                continue
            if start is None:
                start = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[out_names].copy()
            out["rank"] = range(start, start + len(pdf))
            start += len(pdf)
            yield out

    return ordered.mapInPandas(_add_rank, out_schema)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    key_cols: Sequence[str],
    rows_per_shard: int,
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministically shuffle *df* and write it as fixed-size
    shards (``shard=<k>/`` parquet dirs, every shard full except the
    last; ``pos`` is the intra-shard order a loader should replay).
    Returns the manifest ``(shard, n_rows)`` — also persisted beside
    the shards as ``_manifest`` so a loader needs no listing."""
    ranked = deterministic_shuffle_rank(df, key_cols, seed, partitions)
    rps = int(rows_per_shard)
    sharded = ranked.select(
        *[F.col(c) for c in df.columns],
        (F.col("rank") / rps).cast("long").alias("shard"),
        (F.col("rank") % rps).alias("pos"),
    )
    sharded.write.partitionBy("shard").mode("overwrite").parquet(
        os.path.join(out_dir, "shards")
    )
    spark = df.sparkSession
    manifest = (
        read_parquet_state(spark, os.path.join(out_dir, "shards"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest")
    )
    return read_parquet_state(spark, os.path.join(out_dir, "_manifest"))


def write_packed_tensors(
    windows: DataFrame,
    out_dir: str,
    rows_per_shard: int,
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Ship the packed context windows (functions/packing.py::
    pack_token_windows output — one fixed-length ``input_ids`` row per
    pack) as deterministic training shards: the pack rows are
    deterministically shuffled by pack_id (two-phase global rank — no
    single-partition sort) and written as ``shard=<k>/`` parquet dirs
    with an intra-shard ``pos``, plus the ``_manifest`` a loader
    reads instead of listing. The packing-internal ``shard`` column is
    renamed ``pack_shard`` first: the export's own shard key owns the
    name, and the provenance column survives for audits. Returns the
    manifest (shard, n_rows)."""
    return write_training_shards(
        windows.withColumnRenamed("shard", "pack_shard"),
        out_dir,
        ["pack_id"],
        rows_per_shard,
        seed,
        partitions,
    )
