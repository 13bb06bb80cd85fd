"""Inline pipeline metrics via DataFrame observations.

The reference logs per-call progress ("N rows processed", FailedRow
counts) from the driver loop (etlhelper/etl.py logging calls).  On
Spark the driver never sees the rows, so the equivalent is
``df.observe``: metric expressions evaluated INSIDE the job as it
runs — zero extra scans, zero driver round-trips — and collected from
the Observation after any action.  This is the scale-correct way to
answer "how many rows / how many nulls / what value range did this
load actually move?" at 100 TB: a second counting pass over the input
would double the job's cost.

Only aggregate expressions are allowed (Spark enforces this); metrics
surface after the FIRST action that consumes the observed plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.column import Column

__all__ = ["observed", "row_metrics", "run_with_metrics"]


def observed(
    df: DataFrame,
    metrics: dict[str, Column],
    name: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach metric expressions to ``df``; returns (df, observation).

    After any action on the returned DataFrame,
    ``observation.get`` holds {metric_name: value}.
    """
    obs = Observation(name) if name else Observation()
    out = df.observe(obs, *(c.alias(n) for n, c in metrics.items()))
    return out, obs


def row_metrics(df: DataFrame, null_check_cols: list[str] | None = None) -> dict[str, Column]:
    """The standard load-audit metric set: row count plus per-column
    null counts (the reference's FailedRow precondition, checked for
    free instead of via a second scan)."""
    m: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_check_cols or []:
        m[f"nulls_{c}"] = F.count(F.lit(1)) - F.count(F.col(c))
    return m


def run_with_metrics(
    df: DataFrame,
    metrics: dict[str, Column],
    action=None,
) -> tuple[Any, dict[str, Any]]:
    """Run ``action(observed_df)`` (default: ``.count()``) and return
    (action_result, collected_metrics) — one job, both answers."""
    out, obs = observed(df, metrics)
    result = action(out) if action is not None else out.count()
    return result, dict(obs.get)
