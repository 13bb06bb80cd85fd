"""SparkSession factory tuned for the etlhelper_spark engine.

Centralizes the scale-oriented defaults so every entry point (tests,
bench, driver contract) runs with the same plan-shaping configuration:

- AQE on (runtime re-plan, skew-join handling, partition coalescing)
- shuffle partitions sized to the local core count (would be set to
  ~2-3x total executor cores on a real cluster)
- Arrow enabled for the Pandas-UDF transform path
- session timezone pinned to UTC so timestamps round-trip identically
  against file data and external oracles
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "etlhelper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet carries TIMESTAMP(NANOS); this reads them as
        # timestamp_ntz (truncated to micros) instead of erroring
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write micros, not deprecated INT96 (which pyarrow reports as
        # nanos, confusing footer-based type detection)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # At 100 TB these two govern scan parallelism; 128 MB splits are
        # the sweet spot for parquet on object storage.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Runtime filters: big-join probe sides get a bloom filter built
        # from the small side's join keys — rows that can't match die at
        # the SCAN, which at 100 TB is the difference between shuffling
        # the fact table and not.  NOTE: do NOT also enable
        # spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled —
        # on Spark 4.1 local mode it deadlocks session-first queries
        # (verified: even `spark.range(5).count()` never returns).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # default 100 generated-class cache entries thrash on a
        # many-query workload: the widest plans here (multi-table LSH)
        # take ~10s to re-Janino-compile once evicted (measured: q33
        # 2.4s hot / 12.7s after 122 other queries churn the cache).
        # Classes are ~10-100 KB; 4096 entries is some hundreds of MB of
        # driver/executor metaspace — cheap insurance for a long-lived
        # session serving a real query mix (the 123-query bench compiles
        # ~1800 distinct classes per pass; 2000 still evicted across
        # its warm+timed passes).
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply engine-critical runtime confs to an externally-created
    session (e.g. the driver's). Only settable-at-runtime confs here."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
