"""Column profiling: the ANALYZE-style statistics pass.

The reference's ``table_info`` (etlhelper/utils.py:14-40) answers
"what columns does this table have?"; real pipelines also need "what's
IN them?" before trusting a load — row counts, null fractions,
cardinalities, value ranges.  This operator computes all of it in ONE
aggregate pass per column batch:

- ``exact=True``: ``count(DISTINCT col)`` — verifiable, but a full
  shuffle per column; use for tests and small dims.
- ``exact=False`` (the 100 TB default): ``approx_count_distinct``
  (HyperLogLog++, ~kB of mergeable state per column) — the whole
  profile becomes a single map-side-combinable scan with NO shuffle of
  data rows at all.

Output is long-form (one row per column) so profiles of wide tables
stay readable and unionable across tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def _round4(col):
    return F.round(col.cast("decimal(30,10)"), 4).cast("double")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-column stats as (col, n_rows, n_nonnull, ndv, min_val,
    max_val) — numeric min/max cast to double (4dp), others null."""
    columns = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "short", "byte", "double", "float", "decimal")
    }
    profiles = []
    for c in columns:
        ndv = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(c, rsd)
        )
        if c in numeric:
            mn, mx = _round4(F.min(c)), _round4(F.max(c))
        else:
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        profiles.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_nonnull"),
                ndv.alias("ndv"),
                mn.alias("min_val"),
                mx.alias("max_val"),
            ).select(F.lit(c).alias("col"), "*")
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


def join_key_skew(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution profile for a prospective join/aggregation key:
    one row of (col, n_keys, n_rows, max_cnt, avg_cnt, p99_cnt,
    top1_share, skew_ratio).

    This is the measurement that decides the shuffle strategy BEFORE a
    100 TB join: skew_ratio (hot key vs mean) ≈ 1 means plain hash
    partitioning balances; top1_share · n_rows over a task's capacity
    means AQE skew-split or explicit salting (`util.py::salted_join`).
    Cost: one map-side-combinable groupBy on the key plus a tiny
    percentile aggregate over key counts (vocabulary-sized, not
    row-sized).
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        _round4(F.avg("cnt")).alias("avg_cnt"),
        _round4(F.percentile("cnt", F.lit(0.99))).alias("p99_cnt"),
        F.round(
            (F.max("cnt") / F.sum("cnt")).cast("decimal(30,10)"), 6
        ).cast("double").alias("top1_share"),
        _round4(F.max("cnt") / F.avg("cnt")).alias("skew_ratio"),
    ).select(F.lit(key_col).alias("col"), "*")


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content checksum: one row of (n_rows, checksum).

    Copy validation at 100 TB cannot sort-and-compare; this folds an
    md5-derived 60-bit value per row into a modular sum — a single
    map-side-combinable aggregate, no shuffle beyond the 1-row final
    combine, identical under any partitioning or row order.  The hash
    is engine-reproducible (md5 of '|'-joined values with an explicit
    NULL marker), so source and destination engines can each compute
    their own checksum and compare scalars instead of rows.
    Collision odds for accidental corruption are ~2^-31 per comparison
    (sum modulus), plenty for reconciliation alarms; use the row diff
    (anti joins on the same row hash) to LOCATE a mismatch.
    """
    cols = cols or df.columns
    joined = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in cols]
    )
    row_hash = (
        F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
        % F.lit(2147483647)
    )
    return df.agg(
        F.count("*").alias("n_rows"),
        (F.sum(row_hash) % F.lit(2147483647)).alias("checksum"),
    )
