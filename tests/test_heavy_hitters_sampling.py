"""Two-pass exact heavy hitters and deterministic weighted sampling
(functions/util.py::heavy_hitters / weighted_sample)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.util import heavy_hitters, weighted_sample

SF_DIR = "/root/testdata/sf0.001"


def _skewed(spark):
    # zipf-ish: item i appears ~ 3000/i times, i in 1..200
    rows = [(f"item_{i}",) for i in range(1, 201) for _ in range(3000 // i)]
    return spark.createDataFrame(rows, ["v"]).repartition(8)


def test_heavy_hitters_exact_at_small_capacity(spark):
    """Tiny MG capacity (64 counters for 200 distinct items) must
    still produce EXACT results at any certified threshold — the
    candidate superset plus exact recount removes the approximation."""
    df = _skewed(spark)
    n = df.count()
    threshold = n // 60  # comfortably above n/(64+1)
    got = {r["item"]: r["cnt"] for r in
           heavy_hitters(df, "v", min_count=threshold, capacity=64).collect()}
    want = {r["v"]: r["cnt"] for r in
            df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= threshold).collect()}
    assert got == want and want


def test_heavy_hitters_refuses_uncertified_threshold(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError, match="not guaranteed at capacity"):
        heavy_hitters(df, "v", min_count=2, capacity=16)


def test_heavy_hitters_min_frac_and_arg_validation(spark):
    df = _skewed(spark)
    n = df.count()
    got = {r["item"]: r["cnt"] for r in
           heavy_hitters(df, "v", min_frac=0.05, capacity=64).collect()}
    import math
    thr = math.ceil(0.05 * n)
    want = {r["v"]: r["cnt"] for r in
            df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= thr).collect()}
    assert got == want
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(df, "v", min_count=5, min_frac=0.1)
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(df, "v")


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [(None,)] * 100 + [("b",)] * 10, ["v"]
    ).repartition(4)
    got = {r["item"]: r["cnt"] for r in
           heavy_hitters(df, "v", min_count=20, capacity=32).collect()}
    assert got == {"a": 50}


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """Same inputs → same sample at any partitioning; a 100x-weight
    row family must be overrepresented relative to uniform."""
    rows = [(i, 10000 if i < 50 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    s1 = [r["id"] for r in weighted_sample(df.repartition(2), "w", 100, "id").collect()]
    s2 = [r["id"] for r in weighted_sample(df.repartition(32), "w", 100, "id").collect()]
    assert sorted(s1) == sorted(s2) and len(s1) == 100
    heavy = sum(1 for i in s1 if i < 50)
    # 50 rows hold 500k of 695k total weight; uniform would give ~2.5
    assert heavy >= 15


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 7), (5, 7)],
        ["id", "w"],
    )
    got = sorted(r["id"] for r in weighted_sample(df, "w", 10, "id").collect())
    assert got == [4, 5]


def test_stratified_weighted_sample_per_group_determinism(spark):
    from etlhelper_spark.functions.util import stratified_weighted_sample

    rows = [(i, f"s{i % 3}", (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"])
    a = sorted(map(tuple, stratified_weighted_sample(
        df.repartition(2), "grp", "w", 4, "id").collect()))
    b = sorted(map(tuple, stratified_weighted_sample(
        df.repartition(32), "grp", "w", 4, "id").collect()))
    assert a == b and len(a) == 12
    by_g = {}
    for _id, g, _w in a:
        by_g[g] = by_g.get(g, 0) + 1
    assert by_g == {"s0": 4, "s1": 4, "s2": 4}


def test_weighted_sample_incremental_equals_one_shot(spark, tmp_path):
    """Sequential applies == one-shot race over the union, replays
    idempotent, weight filter consistent with the batch sampler."""
    from etlhelper_spark.operators.sample_state import (
        weighted_sample_incremental,
    )

    rows = [(i, (i % 11) + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    sd = str(tmp_path / "state")
    out = None
    for i in range(4):
        out = weighted_sample_incremental(
            df.where(F.pmod("id", F.lit(4)) == i), sd, i, "w", 50, "id"
        )
    got = sorted(r["id"] for r in out.collect())
    want = sorted(
        r["id"] for r in weighted_sample(df, "w", 50, "id").collect()
    )
    assert got == want and len(got) == 50
    # replay of the last batch reads only state below it — same result
    replay = weighted_sample_incremental(
        df.where(F.pmod("id", F.lit(4)) == 3), sd, 3, "w", 50, "id"
    )
    assert sorted(r["id"] for r in replay.collect()) == want
