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
