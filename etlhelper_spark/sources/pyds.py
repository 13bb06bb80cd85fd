"""Custom connector on the Spark 4 Python DataSource API.

The reference's extensibility story is "write a DbHelper for your
database" (reference: etlhelper/db_helpers/db_helper.py subclassing);
Spark's native equivalent is the DataSource V2 API, exposed to Python
since 4.0 (`pyspark.sql.datasource`). This module ships a
deterministic synthetic-telemetry source demonstrating the full
surface: schema declaration, option handling, and PARTITION-PARALLEL
reads (each InputPartition is read by a separate executor task — the
same N-concurrent-cursors shape as a partitioned JDBC scan, so a
1000-executor cluster ingests 1000 ranges at once).

Rows are a pure function of the row id (no RNG), so results are
reproducible on any partitioning and an exact SQL oracle exists
(scripts' DuckDB gate) — the property every test fixture source needs.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["SyntheticTelemetrySource", "register_synthetic_source"]

_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("label", StringType(), False),
        StructField("reading", DoubleType(), False),
    ]
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        # contiguous id ranges; the LAST partition absorbs the remainder
        step = max(1, self.n_rows // self.n_parts)
        parts = []
        for i in range(self.n_parts):
            start = i * step
            end = self.n_rows if i == self.n_parts - 1 else (i + 1) * step
            if start >= self.n_rows:
                break
            parts.append(_RangePartition(start, end))
        return parts

    def read(self, partition: _RangePartition):
        # deterministic: row ≡ f(id); division of small ints is exact
        # IEEE the same way in every engine
        for i in range(partition.start, partition.end):
            yield (i, f"s{i % 5}", (i * 31 % 997) / 1000.0)


class SyntheticTelemetrySource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ehs_synthetic"

    def schema(self):
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering just overwrites)."""
    spark.dataSource.register(SyntheticTelemetrySource)
