"""Incremental Misra-Gries frequency state
(operators/frequency_state.py): certified bounds under real eviction,
exact regime equivalence, replay idempotence."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.operators.frequency_state import (
    heavy_hitters_incremental,
    read_frequency_state,
)


def _zipf_rows(lo, hi):
    return [
        (f"item_{i}",)
        for i in range(1, 201)
        for r in range(3000 // i)
        if lo <= (i * 31 + r) % 100 < hi
    ]


def test_certified_bounds_under_eviction(spark, tmp_path):
    """Small capacity forces real evictions across 3 applies; the MG
    certificate must hold: every item with true count > N/(cap+1) is
    present, and cnt <= true <= cnt + N/(cap+1) for present items."""
    sd = str(tmp_path / "state")
    cap = 32
    truth: collections.Counter = collections.Counter()
    state = None
    for i, (lo, hi) in enumerate([(0, 33), (33, 66), (66, 100)]):
        rows = _zipf_rows(lo, hi)
        truth.update(v for (v,) in rows)
        df = spark.createDataFrame(rows, ["v"]).repartition(8)
        state = heavy_hitters_incremental(df, sd, i, "v", capacity=cap)
    got = {r["item"]: r["cnt"] for r in state.collect() if r["item"]}
    n_total = state.where(F.col("item").isNull()).first()["cnt"]
    assert n_total == sum(truth.values())
    slack = n_total / (cap + 1)
    for item, true_cnt in truth.items():
        if true_cnt > slack:
            assert item in got, (item, true_cnt, slack)
        if item in got:
            assert got[item] <= true_cnt <= got[item] + slack, item
    assert len(got) <= cap


def test_exact_regime_and_replay(spark, tmp_path):
    """Capacity above the vocabulary: no evictions ever, counts exact;
    replaying the last batch reads only versions below it."""
    sd = str(tmp_path / "state")
    rows = [(f"w{i % 20}",) for i in range(5000)]
    df = spark.createDataFrame(rows, ["v"])
    state = None
    for i in range(2):
        state = heavy_hitters_incremental(df, sd, i, "v", capacity=256)
    got = {r["item"]: r["cnt"] for r in state.collect() if r["item"]}
    assert got == {f"w{i}": 500 for i in range(20)}  # 2 applies x 250 each
    replay = heavy_hitters_incremental(df, sd, 1, "v", capacity=256)
    got2 = {r["item"]: r["cnt"] for r in replay.collect() if r["item"]}
    assert got2 == got
    rd = {r["item"]: r["cnt"]
          for r in read_frequency_state(spark, sd, 99).collect()
          if r["item"]}
    assert rd == got


def test_read_empty_state_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no state versions"):
        read_frequency_state(spark, str(tmp_path / "nope"), 5)
