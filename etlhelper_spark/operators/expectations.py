"""Data-quality expectations: declarative row-level contracts checked
in ONE scan.

The reference leaves data validation to the backing database
(PK/unique constraint enforcement in its load tests,
test/integration/etl/test_etl_load.py:48-74); a data-lake pipeline has
no database to lean on, so the engine provides the deequ-style
equivalent: each rule is a boolean SQL expression over a row, and the
whole rule set compiles into a single aggregate pass — conditional
counts are map-side combinable, so a 100 TB contract check costs
exactly one linear scan, no shuffle of data rows, regardless of how
many rules are attached.

Output is long-form (one row per rule) so reports union across tables
and feed the same quarantine/on_error conventions as the load path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations"]


def check_expectations(
    df: DataFrame, rules: dict[str, str | Column]
) -> DataFrame:
    """Evaluate *rules* (name -> boolean expression that should hold
    for every row) in one aggregate pass.

    Returns one row per rule: (rule, n_rows, n_violations,
    violation_rate, passed). A NULL rule result counts as a violation
    (SQL CHECK semantics accept NULL; pipelines quarantining rows must
    not — an unknown is not a pass here).
    """
    if not rules:
        raise ValueError("check_expectations requires at least one rule")
    exprs = {
        name: F.expr(rule) if isinstance(rule, str) else rule
        for name, rule in rules.items()
    }
    agg_cols = [F.count("*").alias("__n_rows")]
    for i, (name, cond) in enumerate(exprs.items()):
        agg_cols.append(
            # outer coalesce: sum over an EMPTY table is NULL — an
            # empty table has zero violations, and passed must be a
            # real boolean, never NULL
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
                ),
                F.lit(0),
            ).alias(f"__v_{i}")
        )
    row = df.agg(*agg_cols)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(exprs)
        ]
    )
    return (
        row.select(F.explode(per_rule).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_violations")
        .select(
            "rule",
            "n_rows",
            "n_violations",
            F.round(
                (F.col("n_violations") / F.greatest(F.col("n_rows"), F.lit(1)))
                .cast("decimal(30,10)"),
                4,
            )
            .cast("double")
            .alias("violation_rate"),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
