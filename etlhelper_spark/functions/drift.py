"""Distribution-drift monitoring — the data-quality gate a 100 TB
ingest pipeline runs between corpus versions / arrival batches before
letting a batch into the training mix: Population Stability Index over
fixed-edge histograms, an EXACT distributed two-sample
Kolmogorov-Smirnov statistic, and null-rate / schema diffs.

Design for scale:

- **Histograms are one linear scan with map-side combine.** Binning is
  a closed-form column expression (no quantile pass, no sort); the
  shuffle carries ``bins`` rows. Fixed equal-width edges (taken from
  the REFERENCE population, the PSI convention) are what makes counts
  mergeable across batches — quantile edges would shift per batch and
  the accumulated state would stop meaning anything
  (operators/drift_state.py builds on exactly this property).
- **PSI is O(bins) post-aggregation arithmetic** — the corpus is never
  shuffled on value, never sorted.
- **Exact KS needs a global ordered prefix sum — done as the classic
  two-phase distributed scan**, not a single-partition window: collapse
  to per-distinct-value counts (groupBy — the only value shuffle),
  range-repartition + sort within partitions, collect ONE bounded row
  per partition (the partition totals), broadcast the running offsets
  back, and take per-partition maxima of |F_a - F_b| in one
  Arrow-batched pass. Driver traffic is O(partitions); no stage ever
  holds more than its own range. (The binned PSI above is the
  cheaper screen when an exact sup-norm is not required.)
- Cumulative counts are exact integers; the only floats are the final
  divisions, identical IEEE ops on every engine — which is what lets
  DuckDB oracles pin these results bit-for-bit (q201/q202/q203).

Reference parity note: the reference (a DB-API cursor wrapper,
/root/reference/etlhelper/etl.py) has no statistics machinery; this
module extends the suite's LLM-pipeline data-quality family
(expectations.py, profile.py) with cross-batch drift.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import literal_frame

__all__ = [
    "chi2_report",
    "equal_width_bin",
    "histogram_counts",
    "psi_report",
    "ks_2samp",
    "null_rate_drift",
    "schema_drift",
]


def _dec6(col: Column) -> Column:
    """Engine-stable 6dp rounding (the queries.py _sround contract)."""
    return F.round(col.cast("decimal(30,10)"), 6).cast("double")


def _as_col(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


def equal_width_bin(col: Column, lo, hi, bins: int) -> Column:
    """Closed-form equal-width bin index in [0, bins): floor(((x - lo)
    * bins) / (hi - lo)), clamped so out-of-range values land in the
    edge bins (new batches may drift OUTSIDE the reference range —
    clamping is what makes the drift visible instead of dropped).
    The op order is fixed so Spark and any IEEE engine (the DuckDB
    oracle) produce identical bits."""
    lo_c, hi_c = _as_col(lo), _as_col(hi)
    raw = F.floor(((col - lo_c) * F.lit(float(bins))) / (hi_c - lo_c)).cast(
        "long"
    )
    return F.least(
        F.lit(bins - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw)
    )


def histogram_counts(
    df: DataFrame, col: str, lo, hi, bins: int
) -> DataFrame:
    """Dense fixed-edge histogram ``(bin, cnt)`` — every bin present
    (zero-filled) so downstream PSI smoothing and state merges see the
    full domain. One scan, map-side partial counts, ``bins``-row
    shuffle; NULLs excluded (they are null_rate_drift's job)."""
    spark = df.sparkSession
    counts = (
        df.where(F.col(col).isNotNull())
        .select(equal_width_bin(F.col(col), lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        spark.range(bins)
        .select(F.col("id").alias("bin"))
        .join(counts, "bin", "left")
        .select(
            "bin", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt")
        )
    )


def psi_report(
    hist_a: DataFrame, hist_b: DataFrame, smoothing: float = 0.5
) -> DataFrame:
    """Per-bin PSI contributions + the total, from two dense
    histograms over the SAME edges: ``(bin, cnt_a, cnt_b, psi_bin,
    psi_total)``. Laplace smoothing keeps empty bins finite (the
    standard additive-half convention); per-bin terms are rounded to
    6dp then summed as exact decimals so the total is independent of
    partitioning and summation order. Everything after the two
    histogram scans is O(bins)."""
    a = hist_a.select("bin", F.col("cnt").alias("cnt_a"))
    b = hist_b.select("bin", F.col("cnt").alias("cnt_b"))
    j = (
        a.join(b, "bin", "full")
        .select(
            "bin",
            F.coalesce("cnt_a", F.lit(0).cast("long")).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0).cast("long")).alias("cnt_b"),
        )
    )
    tot = j.agg(
        F.sum("cnt_a").alias("na"),
        F.sum("cnt_b").alias("nb"),
        F.count(F.lit(1)).alias("nbins"),
    )
    s = float(smoothing)
    pa = (F.col("cnt_a") + F.lit(s)) / (
        F.col("na") + F.col("nbins") * F.lit(s)
    )
    pb = (F.col("cnt_b") + F.lit(s)) / (
        F.col("nb") + F.col("nbins") * F.lit(s)
    )
    with_bins = j.crossJoin(F.broadcast(tot)).select(
        "bin",
        "cnt_a",
        "cnt_b",
        _dec6((pa - pb) * F.log(pa / pb)).alias("psi_bin"),
    )
    from pyspark.sql.window import Window

    # O(bins) rows: the unbounded window is a deliberate tiny-frame op
    return with_bins.select(
        "bin",
        "cnt_a",
        "cnt_b",
        "psi_bin",
        F.round(
            F.sum(F.col("psi_bin").cast("decimal(30,10)")).over(
                Window.partitionBy()
            ),
            6,
        )
        .cast("double")
        .alias("psi_total"),
    )


def chi2_report(
    counts_a: DataFrame, counts_b: DataFrame
) -> DataFrame:
    """Per-category chi-square contributions + the total for a 2 x C
    independence test between two categorical count tables
    ``(category, cnt)`` — the categorical sibling of psi_report, same
    output discipline: ``(category, cnt_a, cnt_b, chi2_cell,
    chi2_total)`` with per-cell terms rounded to 6dp then summed as
    exact decimals, so the total is independent of partitioning and
    summation order.

    Cells: for category c, e_side(c) = n_side x (cnt_a+cnt_b)(c) / n
    and chi2_cell(c) = sum over both sides of (o - e)^2 / e — the
    textbook contingency arithmetic, exactly restatable in SQL (the
    oracle discipline). A category absent from one side counts 0
    there (full join); everything after the two count scans is
    O(categories). The join is null-safe: a NULL category present on
    both sides matches itself (category_counts_incremental's contract
    that NULLs count under their own category — a null-rate shift IS
    drift), instead of splitting into two zero-filled rows that would
    inflate chi2_total."""
    from pyspark.sql.window import Window

    a = counts_a.select(
        F.col("category").alias("cat_a"), F.col("cnt").alias("cnt_a")
    )
    b = counts_b.select(
        F.col("category").alias("cat_b"), F.col("cnt").alias("cnt_b")
    )
    j = a.join(
        b, F.col("cat_a").eqNullSafe(F.col("cat_b")), "full"
    ).select(
        F.coalesce("cat_a", "cat_b").alias("category"),
        F.coalesce("cnt_a", F.lit(0).cast("long")).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0).cast("long")).alias("cnt_b"),
    )
    tot = j.agg(
        F.sum("cnt_a").alias("na"), F.sum("cnt_b").alias("nb")
    )
    n = (F.col("na") + F.col("nb")).cast("double")
    ct = (F.col("cnt_a") + F.col("cnt_b")).cast("double")
    ea = F.col("na") * ct / n
    eb = F.col("nb") * ct / n
    cell = (F.col("cnt_a") - ea) * (F.col("cnt_a") - ea) / ea + (
        F.col("cnt_b") - eb
    ) * (F.col("cnt_b") - eb) / eb
    with_cells = j.crossJoin(F.broadcast(tot)).select(
        "category", "cnt_a", "cnt_b", _dec6(cell).alias("chi2_cell")
    )
    # O(categories) rows: the unbounded window is a deliberate
    # tiny-frame op (psi_report's contract)
    return with_cells.select(
        "category",
        "cnt_a",
        "cnt_b",
        "chi2_cell",
        F.round(
            F.sum(F.col("chi2_cell").cast("decimal(30,10)")).over(
                Window.partitionBy()
            ),
            6,
        )
        .cast("double")
        .alias("chi2_total"),
    )


def ks_2samp(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    partitions: int = 32,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov distance, distributed:
    one-row ``(ks_d, n_a, n_b, n_values)`` with
    ks_d = max over distinct values of \\|F_a(v) - F_b(v)\\| (6dp).

    Phases (the scalable prefix-sum shape — no single-partition
    window): (1) groupBy value → per-value pair counts, the only
    full shuffle; (2) range-repartition + in-partition sort, pinned
    with localCheckpoint so phase totals and the scan agree; (3) per
    range-partition totals → driver (O(partitions) rows), running
    offsets broadcast back in the closure; (4) one Arrow-batched pass
    emits each partition's local max — cumulative counts are exact
    int64, so the only floats are the final divisions, identical on
    every IEEE engine. At 100 TB the distinct-value frame is the data
    reduced by duplication; nothing downstream of (1) re-shuffles it."""
    spark = df_a.sparkSession
    a = (
        df_a.where(F.col(col).isNotNull())
        .select(
            F.col(col).cast("double").alias("x"),
            F.lit(1).cast("long").alias("ca"),
            F.lit(0).cast("long").alias("cb"),
        )
    )
    b = (
        df_b.where(F.col(col).isNotNull())
        .select(
            F.col(col).cast("double").alias("x"),
            F.lit(0).cast("long").alias("ca"),
            F.lit(1).cast("long").alias("cb"),
        )
    )
    pv = (
        a.unionAll(b)
        .groupBy("x")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
        .repartitionByRange(partitions, F.asc("x"))
        .sortWithinPartitions("x")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = sorted(
        pv.groupBy("pid")
        .agg(
            F.sum("ca").alias("ta"),
            F.sum("cb").alias("tb"),
            F.count(F.lit(1)).alias("nv"),
        )
        .collect(),
        key=lambda r: r["pid"],
    )
    n_a = sum(int(r["ta"]) for r in totals)
    n_b = sum(int(r["tb"]) for r in totals)
    n_values = sum(int(r["nv"]) for r in totals)
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"ks_2samp: empty sample (n_a={n_a}, n_b={n_b}) for {col!r}"
        )
    offsets = {}
    run_a = run_b = 0
    for r in totals:
        offsets[int(r["pid"])] = (run_a, run_b)
        run_a += int(r["ta"])
        run_b += int(r["tb"])
    na_f, nb_f = float(n_a), float(n_b)

    def _part_max(batches):
        import numpy as np
        import pandas as pd

        cum_a = cum_b = None
        for pdf in batches:
            if pdf.empty:
                continue
            if cum_a is None:
                cum_a, cum_b = offsets[int(pdf["pid"].iloc[0])]
            ca = pdf["ca"].to_numpy(dtype="int64").cumsum() + cum_a
            cb = pdf["cb"].to_numpy(dtype="int64").cumsum() + cum_b
            cum_a, cum_b = int(ca[-1]), int(cb[-1])
            d = np.abs(ca / na_f - cb / nb_f)
            yield pd.DataFrame({"d": [float(d.max())]})

    part_maxima = pv.mapInPandas(_part_max, "d double")
    counts = literal_frame(
        spark, [(n_a, n_b, n_values)], "n_a long, n_b long, n_values long"
    )
    return counts.crossJoin(
        part_maxima.agg(_dec6(F.max("d")).alias("ks_d"))
    ).select("ks_d", "n_a", "n_b", "n_values")


def null_rate_drift(
    df_a: DataFrame, df_b: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Per-column null-rate comparison ``(column, null_rate_a,
    null_rate_b, delta)`` — two single-scan aggregates (one per side,
    all columns at once), melted and joined on the column name.
    O(cols) result rows."""

    def rates(df, names):
        agg = df.agg(
            *[
                F.avg(F.isnull(c).cast("double")).alias(c)
                for c in names
            ]
        )
        pairs = []
        for c in names:
            pairs.extend([F.lit(c), F.col(c)])
        return agg.select(
            F.explode(
                F.map_entries(F.create_map(*pairs))
            ).alias("e")
        ).select(
            F.col("e.key").alias("column"),
            _dec6(F.col("e.value")).alias("rate"),
        )

    ra = rates(df_a, cols).withColumnRenamed("rate", "null_rate_a")
    rb = rates(df_b, cols).withColumnRenamed("rate", "null_rate_b")
    return ra.join(rb, "column").select(
        "column",
        "null_rate_a",
        "null_rate_b",
        _dec6(F.col("null_rate_b") - F.col("null_rate_a")).alias("delta"),
    )


def schema_drift(df_a: DataFrame, df_b: DataFrame) -> DataFrame:
    """Schema diff as data: ``(column, status, type_a, type_b)`` with
    status ∈ added / removed / type_changed. Pure metadata — no scan
    of either side; the result is a driver-built frame (bounded by
    column counts)."""
    spark = df_a.sparkSession
    ta = {f.name: f.dataType.simpleString() for f in df_a.schema.fields}
    tb = {f.name: f.dataType.simpleString() for f in df_b.schema.fields}
    rows = []
    for name in sorted(set(ta) | set(tb)):
        if name not in tb:
            rows.append((name, "removed", ta[name], None))
        elif name not in ta:
            rows.append((name, "added", None, tb[name]))
        elif ta[name] != tb[name]:
            rows.append((name, "type_changed", ta[name], tb[name]))
    return literal_frame(
        spark, rows,
        "column string, status string, type_a string, type_b string",
    )
