"""df.observe metrics: in-job audit counters (reference parity: the
"N rows processed" / FailedRow accounting of etlhelper/etl.py, done
without a second scan)."""

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.operators import observed, row_metrics, run_with_metrics


def test_run_with_metrics_counts_in_one_job(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id int, v string"
    )
    n, metrics = run_with_metrics(df, row_metrics(df, ["v"]))
    assert n == 4
    assert metrics == {"n_rows": 4, "nulls_v": 2}


def test_observed_custom_aggregates_after_write(spark, tmp_path):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out, obs = observed(
        df,
        {
            "n": F.count(F.lit(1)),
            "max_x": F.max("x"),
            "sum_x": F.sum("x"),
        },
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = dict(obs.get)
    assert got == {"n": 100, "max_x": 198, "sum_x": 9900}


def test_observed_rejects_non_aggregate(spark):
    df = spark.range(5)
    with pytest.raises(Exception):
        out, obs = observed(df, {"bad": F.col("id") + 1})
        out.count()


def test_profile_table_exact_and_approx(spark):
    from etlhelper_spark.operators import profile_table

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (2, 30.0, None), (3, 10.0, "a")],
        "k int, v double, s string",
    )
    prof = {r.col: r for r in profile_table(df, exact=True).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_nonnull == 4
    assert prof["k"].ndv == 3
    assert prof["k"].min_val == 1.0 and prof["k"].max_val == 3.0
    assert prof["v"].n_nonnull == 3 and prof["v"].ndv == 2
    assert prof["s"].n_nonnull == 3
    assert prof["s"].min_val is None  # non-numeric: no range

    approx = {r.col: r for r in profile_table(df).collect()}
    # HLL at this cardinality is exact in practice
    assert approx["k"].ndv == 3


def test_check_expectations_one_scan_and_null_semantics(spark):
    """Rules with NULL results count as violations (quarantine
    semantics); the whole rule set runs as a single aggregate —
    exactly one non-broadcast Exchange in the plan."""
    from etlhelper_spark.operators import check_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id INT, amount DOUBLE"
    )
    out = check_expectations(
        df,
        {
            "amount_positive": "amount > 0",  # NULL for id=2 -> violation
            "id_unique_range": "id BETWEEN 1 AND 3",
        },
    )
    rows = {r["rule"]: r for r in out.collect()}
    assert rows["amount_positive"]["n_violations"] == 2  # NULL + negative
    assert rows["amount_positive"]["passed"] is False
    assert rows["id_unique_range"]["n_violations"] == 0
    assert rows["id_unique_range"]["passed"] is True
    assert all(r["n_rows"] == 3 for r in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    shuffles = [
        m for m in re.findall(r"Exchange \w+", plan)
        if "Broadcast" not in m
    ]
    # partial-aggregate merges move ONE row; no data-row shuffle means
    # every exchange is SinglePartition regardless of rule count
    assert all("SinglePartition" in s for s in shuffles)


def test_check_expectations_empty_rules_raises(spark):
    import pytest as _pytest

    from etlhelper_spark.operators import check_expectations

    df = spark.range(3)
    with _pytest.raises(ValueError):
        check_expectations(df, {})


def test_check_expectations_empty_table_passes(spark):
    from etlhelper_spark.operators import check_expectations

    df = spark.createDataFrame([], "id INT, amount DOUBLE")
    rows = check_expectations(df, {"amount_positive": "amount > 0"}).collect()
    assert rows[0]["n_rows"] == 0
    assert rows[0]["n_violations"] == 0
    assert rows[0]["passed"] is True
