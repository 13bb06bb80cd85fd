"""Shared helpers for the extension operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) *left* side gets a
    random salt in [0, salt); the (smaller) *right* side is replicated
    once per salt value, and the join key becomes (key, salt) — a hot
    key's rows spread across *salt* reducers instead of one.

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is for extreme hot keys (power-law key distributions at
    100 TB) where a single key exceeds what one task can hold. Results
    are identical to a plain join (verified in tests).
    """
    from pyspark.sql import functions as F

    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition *df* up to the cluster's default parallelism if the
    scan produced fewer partitions.

    Small single-file tables arrive as one partition, which serializes
    every downstream explode/hash/UDF stage onto one core. At real
    scale (many files / row groups) the scan already has enough
    partitions and this is a no-op — the check is metadata-only.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_keys: list[str] | None = None,
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Point-in-interval join (ts ∈ [start, end)) as a bucketed
    EQUI-join instead of the theta join Spark would otherwise plan.

    A naive ``events JOIN intervals ON ts BETWEEN start AND end`` has
    no equality predicate, so Catalyst falls back to
    BroadcastNestedLoopJoin — O(|events| × |intervals|) comparisons,
    unusable at 100 TB. Here each interval is exploded into the time
    buckets it overlaps (sequence + explode, JVM-side), events compute
    their single bucket, and the join runs as a hash join on
    (bucket [, extra_keys]) followed by the exact containment filter.
    Cost: |intervals| × avg_buckets_per_interval replication (pick
    ``bucket_seconds`` ≈ median interval length so that's ~2) and one
    shuffle per side — the same recipe range-join-optimized engines
    (DuckDB IEJoin, Databricks RANGE_JOIN hint) apply internally.

    ``how='left'`` keeps unmatched events with NULL interval columns.
    Zero/negative-length intervals are dropped (they contain no ts).
    ``broadcast_intervals=True`` pins a broadcast hash join up front
    (interval tables are usually tiny post-explode) instead of letting
    AQE discover that after materializing the first shuffle stage.
    """
    from pyspark.sql import functions as F

    keys = list(extra_keys or [])
    b = F.lit(int(bucket_seconds))
    ev = events.withColumn(
        "__ev_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    iv = (
        # end is exclusive: the last owned bucket holds end - 1s.
        # Degenerate end <= start intervals are dropped BEFORE
        # sequence(), which would otherwise descend and mis-bucket.
        intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
            "__iv_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start_col)) / b),
                    F.floor((F.unix_timestamp(F.col(end_col)) - 1) / b),
                )
            ),
        )
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    cond = ev["__ev_bucket"] == iv["__iv_bucket"]
    for k in keys:
        cond = cond & (ev[k] == iv[k])
    contained = (ev[ts_col] >= iv[start_col]) & (ev[ts_col] < iv[end_col])
    if how == "inner":
        out = ev.join(iv, cond & contained, "inner")
    elif how == "left":
        out = ev.join(iv, cond & contained, "left")
    else:
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    out = out.drop(ev["__ev_bucket"]).drop(iv["__iv_bucket"])
    for k in keys:
        out = out.drop(iv[k])
    return out


def in_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    max_keys: int = 10_000,
) -> DataFrame:
    """Semi-join *fact* against *dim*'s key set by pushing the keys
    into the fact-side SCAN as an IN predicate — the manual form of
    Spark's runtime filtering / dynamic partition pruning, for when
    the dimension side is known-small after its own filters.

    Where a broadcast left-semi join still reads every fact row and
    filters post-scan, the collected IN list reaches the parquet
    reader as ``PushedFilters: In(key, ...)`` (plan-asserted in
    tests/test_round3_ops.py), so row groups whose min/max stats exclude
    the whole list are skipped WITHOUT being read — and on a
    partitioned-by-key layout, whole directories are pruned. At 100 TB
    that is the difference between scanning the fact table and
    scanning the few percent of it the dimension filter selects.

    The driver-side collect is bounded by contract: if the distinct
    key count exceeds *max_keys* the function falls back to a
    broadcast left-semi join (same result, scan-side pruning lost).
    Result is exactly the left-semi join of fact with dim.
    """
    from pyspark.sql import functions as F

    dim_key = dim_key or fact_key
    keys_df = dim.select(F.col(dim_key).alias("k")).distinct()
    keys = [r["k"] for r in keys_df.limit(max_keys + 1).collect()]
    if len(keys) > max_keys:
        return fact.join(
            F.broadcast(keys_df),
            fact[fact_key] == keys_df["k"],
            "left_semi",
        )
    return fact.where(F.col(fact_key).isin(keys))
