"""Bucketed co-located join: the plan must contain no shuffle Exchange
on either join side once both tables share the bucket spec."""

import pytest

from etlhelper_spark.sources.bucketing import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    from etlhelper_spark.sources import read_parquet_table

    orders = read_parquet_table(spark, f"{SF}/orders.parquet")
    lineitem = read_parquet_table(spark, f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey", "l_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # result sanity: every lineitem matches exactly one order
        n_lineitem = spark.table(right).count()
        assert joined.count() == n_lineitem
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
