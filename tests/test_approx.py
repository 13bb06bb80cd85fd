"""Approximate aggregates: the bounded-memory 100 TB substitutes for
exact distinct/percentile. Verified against exact values within their
documented error bounds (they're approximate — the DuckDB hash oracle
can't check them, so the bound check lives here)."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(src_conn):
    o = src_conn.table_dataframe("orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(
        F.approx_count_distinct("o_custkey", rsd=0.05)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.15  # 3x the 5% rsd


def test_percentile_approx_close_to_exact(src_conn):
    o = src_conn.table_dataframe("orders")
    exact = o.select(
        F.percentile("o_totalprice", F.lit(0.5)).alias("m")
    ).first()["m"]
    approx = o.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("m")
    ).first()["m"]
    assert abs(approx - exact) / exact < 0.01
