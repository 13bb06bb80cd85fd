"""Shared helpers for the extension operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
