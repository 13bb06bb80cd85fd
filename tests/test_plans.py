"""Plan-shape assertions: the scale-critical properties — filter
pushdown, column pruning, broadcast joins — verified on the actual
physical plans (not just results)."""

from pyspark.sql import functions as F

from etlhelper_spark.plans.queries import (
    q02_filter_project,
    q03_join_revenue,
)

SF = "/root/testdata/sf0.001"


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    df = q02_filter_project(spark, SF)
    plan = explain_str(df)
    assert "PushedFilters:" in plan
    assert "o_totalprice" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_projection_pruned(spark):
    df = q02_filter_project(spark, SF)
    plan = explain_str(df)
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the 5 referenced columns are read, not all 6
    assert "o_orderstatus" not in read_schema


def test_dimension_joins_broadcast(spark):
    df = q03_join_revenue(spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_active(spark):
    df = q02_filter_project(spark, SF)
    plan = explain_str(df)
    # formatted explain marks codegen stages with "[codegen id : N]"
    assert "codegen id" in plan


def test_streaming_batch_equivalence(spark, tmp_path):
    """The streaming pipeline must produce exactly the batch result."""
    from etlhelper_spark.sources import read_parquet_table
    from etlhelper_spark.streaming import hourly_counts, streaming_hourly_counts

    batch = hourly_counts(
        read_parquet_table(spark, f"{SF}/events.parquet")
    )
    stream = streaming_hourly_counts(spark, SF, str(tmp_path / "ckpt"))
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s
