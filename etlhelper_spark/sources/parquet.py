"""Parquet source with TIMESTAMP(NANOS) normalization.

Spark has no nanosecond timestamp type; with
``spark.sql.legacy.parquet.nanosAsLong=true`` a TIMESTAMP(NANOS)
column arrives as BIGINT nanoseconds. This reader detects such
columns from the parquet footer (pyarrow, driver-side, metadata-only —
no data read) and converts them to TimestampType by integer division
to microseconds, so downstream operators see real timestamps.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@lru_cache(maxsize=512)
def nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Names of timestamp[ns] columns in a parquet file/directory."""
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        members = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "**/*.parquet"), recursive=True)
        )
        if not members:
            return ()
        target = members[0]
    try:
        schema = pq.read_schema(target)
    except Exception:
        return ()
    import pyarrow as pa

    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def read_parquet_table(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp columns restored to
    TimestampType (micros precision, matching every SQL engine's
    truncation of nanos).

    ``merge_schema=True`` reconciles schema evolution across a
    table's files (columns added over time surface as nulls in old
    files) by merging every footer — a distributed metadata job, so
    leave it off for stable-schema tables: at 100 TB the footer sweep
    alone touches millions of files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    long_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "bigint"
    }
    for col in nanos_timestamp_columns(path):
        # only convert when Spark actually surfaced the column as a
        # long: INT96 timestamps also look like timestamp[ns] to
        # pyarrow but Spark reads them natively as TIMESTAMP
        if col in long_cols:
            df = df.withColumn(
                col,
                F.expr(f"timestamp_micros(CAST({col} DIV 1000 AS BIGINT))"),
            )
    return df
