"""In-engine quality-classifier CALIBRATION — distributed logistic
regression by full-batch gradient descent, the step that turns the
suite's fixed-weight scorers (text.py::quality_logit) into weights
LEARNED from labels (human ratings, a held-out benchmark signal, a
teacher model's verdicts) without the corpus ever leaving the engine.

Spark-first decomposition (the k-means/BPE iterative discipline):

- per ROUND, every gradient component computes in ONE combinable
  aggregate over the corpus — the per-row residual terms
  ``(p - y)`` / ``(p - y) * x_f`` are cast to DECIMAL(30,10) BEFORE
  summation, so the gradient sums are EXACT and independent of
  partitioning/merge order (a double sum would make the learned
  weights hash-unstable across core counts);
- the weight vector is the bounded driver artifact (|features| + 1
  floats — the codebook/pivot contract), updated via the proven
  _round6_py bit-mirror of the corpus-wide DECIMAL(30,10)->6dp
  HALF_UP two-step, so a DuckDB oracle that unrolls the same rounds
  reproduces every weight bit-for-bit (q141's discipline applied to
  an optimizer);
- rounds chain as plain Python iterations — each round's weights
  enter the next round's plan as LITERALS, so the per-round plan is
  one scan + one combinable aggregate, no joins, no persisted state.

At 100 TB: cost is rounds x (one corpus scan + an O(features)
aggregate) — the same shape as every trainer here; features should be
cheap column expressions (the caller projects them), and the weight
count is bounded, so the driver never holds data-sized state.

Reference parity note: the reference (a DB-API cursor wrapper) has no
model training; this extends the suite's iterative-trainer family
(k-means, PQ, BPE) with the supervised member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logit_score", "logit_train"]


def logit_train(
    df: DataFrame,
    features: list[str],
    label_col: str,
    rounds: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """Train logistic-regression weights on *df* (full-batch GD from
    zero weights, *rounds* steps of size *lr*) and return the learned
    model as (term, weight) rows — ``__bias__`` plus one row per
    feature, every weight 6dp-rounded through the cross-engine
    two-step so the training is hash-verifiable.

    Deterministic by construction: sigmoid inputs are literal-weight
    column expressions, per-row gradient terms round to exact decimals
    before the (combinable, order-independent) sum, and updates go
    through _round6_py — partitioning cannot move a single bit."""
    from .similarity import _round6_py
    from .util import literal_frame

    spark = df.sparkSession
    names = list(features)
    w = {f: 0.0 for f in names}
    b = 0.0
    for _ in range(int(rounds)):
        z = F.lit(float(b))
        for f in names:
            z = z + F.lit(float(w[f])) * F.col(f)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = p - F.col(label_col).cast("double")
        aggs = [
            F.sum(resid.cast("decimal(30,10)")).alias("g__b"),
            F.count(F.lit(1)).alias("n"),
        ]
        aggs += [
            F.sum((resid * F.col(f)).cast("decimal(30,10)")).alias(
                f"g_{i}"
            )
            for i, f in enumerate(names)
        ]
        row = df.agg(*aggs).first()
        n = int(row["n"])
        b = _round6_py(b - ((float(lr) * float(row["g__b"])) / n))
        for i, f in enumerate(names):
            w[f] = _round6_py(
                w[f] - ((float(lr) * float(row[f"g_{i}"])) / n)
            )
    out = [("__bias__", float(b))] + [(f, float(w[f])) for f in names]
    return literal_frame(spark, out, "term string, weight double")


def logit_score(
    df: DataFrame,
    weights: DataFrame,
    features: list[str],
    out_col: str = "score",
) -> DataFrame:
    """Score *df* with a trained (term, weight) model — the inference
    half of logit_train: *out_col* = sigmoid(bias + w·x), 6dp-rounded
    through the cross-engine decimal two-step so scores are
    hash-stable and oracle-restatable. The weight table is the
    bounded driver artifact (|features|+1 rows — the codebook
    contract), collected once and folded into the plan as LITERALS:
    scoring is a pure projection, one scan, zero joins, zero shuffle
    — the right shape for scoring 100 TB of candidate pairs."""
    w = {r["term"]: float(r["weight"]) for r in weights.collect()}
    missing = [f for f in features if f not in w]
    if "__bias__" not in w or missing:
        raise ValueError(
            f"logit_score: weight table missing terms "
            f"{['__bias__'] * ('__bias__' not in w) + missing}"
        )
    z = F.lit(w["__bias__"])
    for f in features:
        z = z + F.lit(w[f]) * F.col(f)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(
        out_col,
        F.round(p.cast("decimal(30,10)"), 6).cast("double"),
    )
