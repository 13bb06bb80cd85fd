"""Incremental KLL quantile state (operators/quantile_state.py):
merge/replay/guard contracts and estimate quality."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.operators.quantile_state import (
    quantile_sketch_incremental,
    quantiles_from_state,
    read_quantile_state,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(v),) for v in xs], "x double")


def test_sequential_applies_track_full_stream(spark):
    work = tempfile.mkdtemp(prefix="ehs_kll_t_")
    try:
        xs = [float(i) for i in range(3000)]
        for i in range(3):
            quantile_sketch_incremental(
                _vals(spark, xs[i * 1000 : (i + 1) * 1000]), work, i, "x"
            )
        out = {
            r["p"]: r
            for r in quantiles_from_state(
                spark, work, 3, [0.5, 0.9]
            ).collect()
        }
        assert out[0.5]["n"] == 3000
        # ~1.65% rank error at k=200 → generous 5% value tolerance here
        assert abs(out[0.5]["q"] - 1500.0) <= 150.0
        assert abs(out[0.9]["q"] - 2700.0) <= 150.0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_replay_reads_only_prior_versions(spark):
    work = tempfile.mkdtemp(prefix="ehs_kll_t_")
    try:
        quantile_sketch_incremental(_vals(spark, range(100)), work, 0, "x")
        first = quantile_sketch_incremental(
            _vals(spark, range(100, 200)), work, 1, "x"
        ).first()
        replay = quantile_sketch_incremental(
            _vals(spark, range(100, 200)), work, 1, "x"
        ).first()
        assert replay["n"] == first["n"] == 200
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_k_mismatch_raises(spark):
    work = tempfile.mkdtemp(prefix="ehs_kll_t_")
    try:
        quantile_sketch_incremental(
            _vals(spark, range(10)), work, 0, "x", k=200
        )
        with pytest.raises(ValueError, match="k="):
            quantile_sketch_incremental(
                _vals(spark, range(10)), work, 1, "x", k=400
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_empty_batch_keeps_state(spark):
    work = tempfile.mkdtemp(prefix="ehs_kll_t_")
    try:
        quantile_sketch_incremental(_vals(spark, range(100)), work, 0, "x")
        empty = _vals(spark, []).where(F.lit(False))
        st = quantile_sketch_incremental(empty, work, 1, "x").first()
        assert st["n"] == 100 and st["sk"] is not None
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_first_batch_empty_raises(spark):
    work = tempfile.mkdtemp(prefix="ehs_kll_t_")
    try:
        empty = _vals(spark, []).where(F.lit(False))
        with pytest.raises(ValueError, match="nothing to seed"):
            quantile_sketch_incremental(empty, work, 0, "x")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_read_missing_state_raises(spark):
    with pytest.raises(ValueError, match="no state versions"):
        read_quantile_state(spark, "/tmp/ehs_kll_nonexistent", 3)
