"""In-engine logistic regression (functions/calibrate.py): exact
agreement with a driver-side numpy reference that applies the same
decimal-rounding contract, partition invariance, and learning sanity
on separable planted data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.calibrate import logit_train
from etlhelper_spark.functions.similarity import _round6_py


def _planted(spark, n=400, parts=1):
    # x1 separates the classes (y=1 has larger x1); x2 is pure noise
    rows = []
    for i in range(n):
        y = i % 2
        x1 = (1.0 + y) + (i % 7) / 10.0
        x2 = (i % 5) / 5.0
        rows.append((float(x1), float(x2), int(y)))
    return spark.createDataFrame(
        rows, "x1 double, x2 double, y int"
    ).repartition(parts)


def _reference(rows, rounds=3, lr=0.5):
    """Driver-side mirror: exact-decimal gradient sums via Python
    Decimal, updates through _round6_py — the engine's contract
    restated independently."""
    from decimal import ROUND_HALF_UP, Decimal

    def dec10(v):
        return Decimal(repr(float(v))).quantize(
            Decimal("0.0000000001"), rounding=ROUND_HALF_UP
        )

    X = np.array([[r[0], r[1]] for r in rows])
    y = np.array([r[2] for r in rows], dtype=np.float64)
    n = len(rows)
    w = np.zeros(2)
    b = 0.0
    for _ in range(rounds):
        z = b + X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        resid = p - y
        gb = sum((dec10(v) for v in resid), Decimal(0))
        g1 = sum((dec10(v) for v in resid * X[:, 0]), Decimal(0))
        g2 = sum((dec10(v) for v in resid * X[:, 1]), Decimal(0))
        b = _round6_py(b - ((lr * float(gb)) / n))
        w = np.array(
            [
                _round6_py(w[0] - ((lr * float(g1)) / n)),
                _round6_py(w[1] - ((lr * float(g2)) / n)),
            ]
        )
    return {"__bias__": b, "x1": float(w[0]), "x2": float(w[1])}


def test_logit_matches_reference_and_partition_invariant(spark):
    df1 = _planted(spark, parts=1)
    df32 = _planted(spark, parts=32)
    got1 = {
        r["term"]: r["weight"]
        for r in logit_train(df1, ["x1", "x2"], "y", rounds=3).collect()
    }
    got32 = {
        r["term"]: r["weight"]
        for r in logit_train(df32, ["x1", "x2"], "y", rounds=3).collect()
    }
    assert got1 == got32  # exact-decimal gradients: bit-identical
    rows = [(r["x1"], r["x2"], r["y"]) for r in df1.collect()]
    want = _reference(rows, rounds=3)
    for k in want:
        assert got1[k] == pytest.approx(want[k], abs=2e-6)


def test_logit_learns_the_separating_feature(spark):
    df = _planted(spark)
    w = {
        r["term"]: r["weight"]
        for r in logit_train(df, ["x1", "x2"], "y", rounds=5).collect()
    }
    # y=1 rows have strictly larger x1: its weight must move positive
    # and dominate the noise feature's
    assert w["x1"] > 0
    assert abs(w["x1"]) > abs(w["x2"])
