"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship star-join query at sf0.001;
queries()/oracle_sql() expose the declared corpus from
etlhelper_spark.plans.queries — every operator family from SURVEY §2
plus the dedup/similarity/text/multimodal/streaming extensions, each
paired with its DuckDB oracle SQL (omitted only for genuinely
approximate ops, which get the rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etlhelper_spark.plans import ORACLES, QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
