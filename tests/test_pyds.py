"""Python DataSource API connector (sources/pyds.py)."""

from __future__ import annotations

import pytest

from etlhelper_spark.sources.pyds import register_synthetic_source


@pytest.fixture(autouse=True)
def _register(spark):
    register_synthetic_source(spark)


def _read(spark, rows, partitions):
    return (
        spark.read.format("ehs_synthetic")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_partition_count_honored(spark):
    df = _read(spark, 100, 4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_remainder_rows_not_lost(spark):
    # 103 rows / 4 partitions: last partition absorbs the remainder
    df = _read(spark, 103, 4)
    assert df.count() == 103
    ids = sorted(r["id"] for r in df.collect())
    assert ids == list(range(103))


def test_content_independent_of_partitioning(spark):
    one = sorted(tuple(r) for r in _read(spark, 50, 1).collect())
    many = sorted(tuple(r) for r in _read(spark, 50, 7).collect())
    assert one == many


def test_more_partitions_than_rows(spark):
    df = _read(spark, 3, 8)
    assert df.count() == 3
