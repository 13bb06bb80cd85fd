"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
the shuffle of both sides. Writing both tables bucketed on the join
key — same bucket count, same key — pins co-partitioning into the
storage layout: Spark's planner proves both sides share the
partitioning and elides the Exchange entirely. The shuffle is paid
once at write time, then amortized over every subsequent join.

``sortBy`` within buckets additionally removes the per-task Sort
before a sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..validation import validate_identifier


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist *df* as a bucketed (and bucket-sorted) catalog table."""
    validate_identifier(table)
    validate_identifier(bucket_col)
    writer = (
        df.write.format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .mode(mode)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str,
    key_right: str,
) -> DataFrame:
    """Join two bucketed tables on their bucket keys. With matching
    bucket specs the physical plan contains no Exchange on either side
    (asserted in tests)."""
    validate_identifier(left_table)
    validate_identifier(right_table)
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
