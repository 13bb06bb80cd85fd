"""Incremental view maintenance for additive rollups.

The pattern behind every "keep the dashboard table fresh without
re-scanning history" pipeline: a persisted aggregate over an append
stream is updated by merging the NEW batch's partial aggregate into the
stored one. Works for any algebraic aggregate that decomposes into
mergeable partials — count, sum (and thus avg = sum/count), min, max —
which is the same property Spark itself exploits for map-side partial
aggregation.

At 100 TB the stored rollup is |groups| rows and the per-batch work is
O(batch) + a join against |groups| — history is never re-read. Deletes
arrive as negative deltas (count -1, sum -x), the CDC convention, so
the same merge handles retractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_partial(
    df: DataFrame, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """One batch's partial aggregate: count + the named sums.

    ``sum_cols`` maps output column -> input column, e.g.
    ``{"sum_value": "value"}``. The output schema is the stored
    rollup's schema, so partials and stored state merge symmetrically.
    """
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(src).alias(dst) for dst, src in sum_cols.items()]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup(
    base: DataFrame, delta_partial: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge a delta's partial aggregate into the stored rollup.

    Full outer join on the group keys (the only shuffle, sized
    |groups|, not |history|), then each measure adds with
    null-as-zero. Groups whose merged count reaches 0 (pure
    retraction) are dropped, so insert-then-delete round-trips to
    absence. The result is exactly ``rollup_partial`` over the unioned
    inputs — asserted against a full recompute in the oracle of
    q162_incremental_rollup and in tests/test_round3_ops.py.
    """
    measures = [c for c in base.columns if c not in keys]
    b = base.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in measures]
    )
    d = delta_partial.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in measures]
    )
    merged = b.join(d, keys, "full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"__b_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in measures
        ],
    )
    return merged.where(F.col("n") != 0)


def streaming_incremental_rollup(
    spark,
    sf_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    source_files: int = 4,
) -> DataFrame:
    """Streaming form of the rollup maintenance: each micro-batch's
    partial aggregate merges into parquet state via foreachBatch —
    the continuously-fresh dashboard table.

    State is versioned per batch (``state_dir/v{batch_id}``) and the
    merge reads the latest prior version, so a replayed batch
    overwrites its own version instead of double-counting — idempotent
    under foreachBatch's at-least-once contract, same ledger idea as
    the exactly-once JDBC sink. The events table is re-split into
    *source_files* files so availableNow genuinely exercises multiple
    incremental merges (one file per trigger).

    Returns the final state DataFrame; equals the batch rollup over
    all events (q163's oracle)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from ..sources import read_parquet_table

    split_dir = os.path.join(state_dir, "_source")
    read_parquet_table(
        spark, os.path.join(sf_dir, "events.parquet")
    ).repartition(source_files).write.mode("overwrite").parquet(split_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(split_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
        .select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    keys = ["event_type", "day"]

    def upsert(batch_df, batch_id: int) -> None:
        partial = rollup_partial(batch_df, keys, {"value_cents": "cents"})
        prior = [
            int(os.path.basename(p)[1:])
            for p in glob.glob(os.path.join(state_dir, "v*"))
            if int(os.path.basename(p)[1:]) < batch_id
        ]
        if prior:
            base = batch_df.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{max(prior)}")
            )
            merged = merge_rollup(base, partial, keys)
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions = [
        int(os.path.basename(p)[1:])
        for p in glob.glob(os.path.join(state_dir, "v*"))
    ]
    return spark.read.parquet(os.path.join(state_dir, f"v{max(versions)}"))


def rollup_partial_monotonic(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Partial aggregate extended with min/max measures.

    min/max are mergeable but NOT retraction-safe (deleting the
    current minimum cannot be undone from the aggregate alone), so
    views maintained with them accept APPEND-ONLY feeds — enforced by
    merge_rollup_monotonic rejecting negative counts."""
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(src).alias(dst) for dst, src in (sum_cols or {}).items()]
    aggs += [F.min(src).alias(dst) for dst, src in (min_cols or {}).items()]
    aggs += [F.max(src).alias(dst) for dst, src in (max_cols or {}).items()]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup_monotonic(
    base: DataFrame,
    delta_partial: DataFrame,
    keys: list[str],
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Append-only merge for rollups carrying min/max measures:
    additive columns add, min/max columns combine with least/greatest.
    Raises at plan-execution time on retractions (negative delta
    counts) via an ANSI assert — min/max cannot honor deletes, and a
    silent wrong answer is worse than a failed batch."""
    measures = [c for c in base.columns if c not in keys]
    additive = [
        c for c in measures if c not in min_cols and c not in max_cols
    ]
    b = base.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in measures]
    )
    guarded = delta_partial.withColumn(
        "n",
        F.when(
            F.col("n") < 0,
            F.raise_error(
                F.lit("merge_rollup_monotonic: retraction (n < 0) "
                      "not supported with min/max measures")
            ).cast("long"),
        ).otherwise(F.col("n")),
    )
    d = guarded.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in measures]
    )
    merged = b.join(d, keys, "full_outer").select(
        *keys,
        *[
            (
                F.least(F.col(f"__b_{c}"), F.col(f"__d_{c}"))
                if c in min_cols
                else F.greatest(F.col(f"__b_{c}"), F.col(f"__d_{c}"))
                if c in max_cols
                else (
                    F.coalesce(F.col(f"__b_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                )
            ).alias(c)
            for c in measures
        ],
    )
    return merged.where(F.col("n") != 0)
