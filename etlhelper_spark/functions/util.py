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
