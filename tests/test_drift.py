"""Drift-monitoring suite (functions/drift.py, operators/drift_state.py):
PSI, exact distributed KS, null/schema diffs, and the incremental
histogram state's merge/replay/guard contracts."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.drift import (
    equal_width_bin,
    histogram_counts,
    ks_2samp,
    null_rate_drift,
    psi_report,
    schema_drift,
)
from etlhelper_spark.operators.drift_state import (
    histogram_incremental,
    psi_against_state,
    read_histogram_state,
)


def _vals(spark, xs, col="x"):
    return spark.createDataFrame([(float(v),) for v in xs], f"{col} double")


# ---------------------------------------------------------------- binning
def test_equal_width_bin_clamps_out_of_range(spark):
    df = _vals(spark, [-5.0, 0.0, 2.5, 9.99, 10.0, 42.0])
    rows = df.select(
        equal_width_bin(F.col("x"), 0.0, 10.0, 10).alias("bin")
    ).collect()
    assert [r["bin"] for r in rows] == [0, 0, 2, 9, 9, 9]


def test_histogram_counts_dense_and_exact(spark):
    df = _vals(spark, [0.0, 0.1, 5.0, 9.9])
    h = {
        r["bin"]: r["cnt"]
        for r in histogram_counts(df, "x", 0.0, 10.0, 5).collect()
    }
    assert h == {0: 2, 1: 0, 2: 1, 3: 0, 4: 1}
    # nulls excluded, not binned
    withnull = df.unionAll(
        spark.createDataFrame([(None,)], "x double")
    )
    total = sum(
        r["cnt"]
        for r in histogram_counts(withnull, "x", 0.0, 10.0, 5).collect()
    )
    assert total == 4


# -------------------------------------------------------------------- PSI
def test_psi_identical_populations_is_zero(spark):
    df = _vals(spark, range(100))
    h = histogram_counts(df, "x", 0.0, 100.0, 10)
    rows = psi_report(h, h).collect()
    assert all(r["psi_bin"] == 0.0 for r in rows)
    assert rows[0]["psi_total"] == 0.0


def test_psi_matches_closed_form(spark):
    a = _vals(spark, [1.0] * 8 + [5.0] * 2)
    b = _vals(spark, [1.0] * 2 + [5.0] * 8)
    ha = histogram_counts(a, "x", 0.0, 10.0, 2)
    hb = histogram_counts(b, "x", 0.0, 10.0, 2)
    out = {r["bin"]: r for r in psi_report(ha, hb).collect()}
    s, nbins = 0.5, 2
    expect_total = 0.0
    for bin_, ca, cb in [(0, 8, 2), (1, 2, 8)]:
        pa = (ca + s) / (10 + nbins * s)
        pb = (cb + s) / (10 + nbins * s)
        term = round((pa - pb) * math.log(pa / pb), 6)
        assert out[bin_]["psi_bin"] == pytest.approx(term, abs=1e-9)
        expect_total += term
    assert out[0]["psi_total"] == pytest.approx(expect_total, abs=1e-9)


# --------------------------------------------------------------------- KS
def test_ks_identical_samples_is_zero(spark):
    df = _vals(spark, range(50))
    row = ks_2samp(df, df, "x").first()
    assert row["ks_d"] == 0.0
    assert row["n_a"] == row["n_b"] == row["n_values"] == 50


def test_ks_disjoint_samples_is_one(spark):
    a = _vals(spark, range(0, 10))
    b = _vals(spark, range(100, 110))
    assert ks_2samp(a, b, "x").first()["ks_d"] == 1.0


def test_ks_matches_reference_computation(spark):
    # hand-computable with ties and unequal sizes
    a = [1.0, 2.0, 2.0, 3.0, 7.0]
    b = [2.0, 4.0, 4.0, 8.0]
    row = ks_2samp(_vals(spark, a), _vals(spark, b), "x").first()
    values = sorted(set(a + b))
    best = 0.0
    for v in values:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    assert row["ks_d"] == pytest.approx(round(best, 6), abs=1e-9)
    assert (row["n_a"], row["n_b"], row["n_values"]) == (5, 4, 6)


def test_ks_partition_seams_are_exact(spark):
    # many partitions + heavy ties: offsets must stitch local cumsums
    a = [float(i % 17) for i in range(500)]
    b = [float(i % 23) for i in range(400)]
    row = ks_2samp(
        _vals(spark, a), _vals(spark, b), "x", partitions=16
    ).first()
    values = sorted(set(a + b))
    best = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in values
    )
    assert row["ks_d"] == pytest.approx(round(best, 6), abs=1e-9)


def test_ks_empty_side_raises(spark):
    a = _vals(spark, [1.0])
    empty = _vals(spark, []).where(F.lit(False))
    with pytest.raises(ValueError, match="empty sample"):
        ks_2samp(a, empty, "x")


# ------------------------------------------------------- null/schema diff
def test_null_rate_drift(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, "y")], "id long, s string"
    )
    b = spark.createDataFrame([(1, None), (2, "z")], "id long, s string")
    out = {r["column"]: r for r in null_rate_drift(a, b, ["id", "s"]).collect()}
    assert out["id"]["null_rate_a"] == 0.0 and out["id"]["delta"] == 0.0
    assert out["s"]["null_rate_a"] == 0.5
    assert out["s"]["null_rate_b"] == 0.5
    assert out["s"]["delta"] == 0.0


def test_schema_drift(spark):
    a = spark.createDataFrame([(1, "x", 0.5)], "id long, s string, v double")
    b = spark.createDataFrame([(1, 2, True)], "id long, s int, flag boolean")
    out = {r["column"]: r for r in schema_drift(a, b).collect()}
    assert out["v"]["status"] == "removed"
    assert out["flag"]["status"] == "added"
    assert out["s"]["status"] == "type_changed"
    assert (out["s"]["type_a"], out["s"]["type_b"]) == ("string", "int")
    assert "id" not in out


# ------------------------------------------------- incremental histogram
def test_histogram_state_sequential_equals_oneshot(spark):
    work = tempfile.mkdtemp(prefix="ehs_drift_t_")
    try:
        xs = [float(i % 37) for i in range(300)]
        full = _vals(spark, xs)
        state = None
        for i in range(3):
            batch = _vals(spark, xs[i * 100 : (i + 1) * 100])
            state = histogram_incremental(
                batch, work, i, "x", 0.0, 37.0, bins=8
            )
        got = {r["bin"]: r["cnt"] for r in state.collect()}
        want = {
            r["bin"]: r["cnt"]
            for r in histogram_counts(full, "x", 0.0, 37.0, 8).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_histogram_state_replay_idempotent(spark):
    work = tempfile.mkdtemp(prefix="ehs_drift_t_")
    try:
        b0 = _vals(spark, [1.0, 2.0, 3.0])
        b1 = _vals(spark, [4.0, 5.0])
        histogram_incremental(b0, work, 0, "x", 0.0, 10.0, bins=4)
        first = {
            r["bin"]: r["cnt"]
            for r in histogram_incremental(
                b1, work, 1, "x", 0.0, 10.0, bins=4
            ).collect()
        }
        # replay of batch 1 reads only versions below 1 — same result
        replay = {
            r["bin"]: r["cnt"]
            for r in histogram_incremental(
                b1, work, 1, "x", 0.0, 10.0, bins=4
            ).collect()
        }
        assert replay == first
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_histogram_state_edge_mismatch_raises(spark):
    work = tempfile.mkdtemp(prefix="ehs_drift_t_")
    try:
        histogram_incremental(
            _vals(spark, [1.0]), work, 0, "x", 0.0, 10.0, bins=4
        )
        with pytest.raises(ValueError, match="edges"):
            histogram_incremental(
                _vals(spark, [2.0]), work, 1, "x", 0.0, 20.0, bins=4
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_psi_against_state_reads_edges_from_state(spark):
    work = tempfile.mkdtemp(prefix="ehs_drift_t_")
    try:
        histogram_incremental(
            _vals(spark, [float(i) for i in range(50)]),
            work, 0, "x", 0.0, 50.0, bins=5,
        )
        out = psi_against_state(
            _vals(spark, [float(i) for i in range(50)]), work, 1, "x"
        ).collect()
        assert len(out) == 5
        assert all(r["psi_bin"] == 0.0 for r in out)
        st = read_histogram_state(spark, work, 1)
        assert st.select("bins").first()["bins"] == 5
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_read_histogram_state_missing_raises(spark):
    with pytest.raises(ValueError, match="no state versions"):
        read_histogram_state(spark, "/tmp/ehs_drift_nonexistent", 5)


# ------------------------------------------------- categorical state
def _cats(spark, vals, col="src"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} string")


def test_category_state_sequential_equals_oneshot(spark):
    from etlhelper_spark.operators.drift_state import (
        category_counts_incremental,
        read_category_state,
    )

    work = tempfile.mkdtemp(prefix="ehs_cat_t_")
    try:
        category_counts_incremental(
            _cats(spark, ["a", "a", "b"]), work, 0, "src"
        )
        category_counts_incremental(
            _cats(spark, ["b", "c", None]), work, 1, "src"
        )
        st = {
            r["category"]: r["cnt"]
            for r in read_category_state(spark, work, 2).collect()
        }
        # accumulated state == one-shot counts of the union; a category
        # first seen in batch 1 appears, NULL counts as its own bucket
        assert st == {"a": 2, "b": 2, "c": 1, None: 1}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_category_state_column_mismatch_raises(spark):
    from etlhelper_spark.operators.drift_state import (
        category_counts_incremental,
    )

    work = tempfile.mkdtemp(prefix="ehs_cat_t_")
    try:
        category_counts_incremental(_cats(spark, ["a"]), work, 0, "src")
        with pytest.raises(ValueError, match="counts column"):
            category_counts_incremental(
                _cats(spark, ["a"], col="other"), work, 1, "other"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_chi2_against_state_matches_closed_form(spark):
    from etlhelper_spark.functions.drift import chi2_report
    from etlhelper_spark.operators.drift_state import (
        category_counts_incremental,
        chi2_against_state,
    )

    work = tempfile.mkdtemp(prefix="ehs_cat_t_")
    try:
        category_counts_incremental(
            _cats(spark, ["a"] * 30 + ["b"] * 10), work, 0, "src"
        )
        out = {
            r["category"]: r
            for r in chi2_against_state(
                _cats(spark, ["a"] * 10 + ["b"] * 30), work, 1
            ).collect()
        }
        # closed form: na=nb=40, col totals a:40 b:40 -> every e=20;
        # cell chi2 = (30-20)^2/20 + (10-20)^2/20 = 10 per category
        assert out["a"]["chi2_cell"] == pytest.approx(10.0)
        assert out["b"]["chi2_cell"] == pytest.approx(10.0)
        assert out["a"]["chi2_total"] == pytest.approx(20.0)
        # identical distributions -> chi2 == 0
        same = chi2_report(
            spark.createDataFrame(
                [("a", 30), ("b", 10)], "category string, cnt long"
            ),
            spark.createDataFrame(
                [("a", 30), ("b", 10)], "category string, cnt long"
            ),
        ).collect()
        assert all(r["chi2_cell"] == 0.0 for r in same)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------------------- embedding state
def _embs(spark, rows):
    return spark.createDataFrame(
        [(list(map(float, v)),) for v in rows], "embedding array<double>"
    )


def test_embedding_moments_sequential_equals_oneshot(spark):
    from etlhelper_spark.operators.drift_state import (
        embedding_moments_incremental,
        read_embedding_state,
    )

    seq = tempfile.mkdtemp(prefix="ehs_emb_t_")
    one = tempfile.mkdtemp(prefix="ehs_emb_t_")
    try:
        b0 = _embs(spark, [[1.25, 2.0], [3.5, -1.0]])
        b1 = _embs(spark, [[0.5, 0.25]])
        embedding_moments_incremental(b0, seq, 0)
        embedding_moments_incremental(b1, seq, 1)
        embedding_moments_incremental(
            _embs(spark, [[1.25, 2.0], [3.5, -1.0], [0.5, 0.25]]), one, 0
        )
        got = sorted(
            (r["pos"], r["n"], float(r["s"]))
            for r in read_embedding_state(spark, seq, 9).collect()
        )
        want = sorted(
            (r["pos"], r["n"], float(r["s"]))
            for r in read_embedding_state(spark, one, 9).collect()
        )
        # exact decimal sums: sequential applies == one-shot, bit-for-bit
        assert got == want == [(1, 3, 5.25), (2, 3, 1.25)]
    finally:
        shutil.rmtree(seq, ignore_errors=True)
        shutil.rmtree(one, ignore_errors=True)


def test_embedding_moments_dim_mismatch_raises(spark):
    from etlhelper_spark.operators.drift_state import (
        embedding_moments_incremental,
    )

    work = tempfile.mkdtemp(prefix="ehs_emb_t_")
    try:
        embedding_moments_incremental(_embs(spark, [[1.0, 2.0]]), work, 0)
        with pytest.raises(ValueError, match="dim="):
            embedding_moments_incremental(
                _embs(spark, [[1.0, 2.0, 3.0]]), work, 1
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_embedding_drift_identical_centroids(spark):
    from etlhelper_spark.operators.drift_state import (
        embedding_drift_against_state,
        embedding_moments_incremental,
    )

    work = tempfile.mkdtemp(prefix="ehs_emb_t_")
    try:
        embedding_moments_incremental(
            _embs(spark, [[1.0, 0.0], [3.0, 2.0]]), work, 0
        )
        out = {
            r["pos"]: r
            for r in embedding_drift_against_state(
                _embs(spark, [[2.0, 1.0]]), work, 1
            ).collect()
        }
        # both centroids are (2.0, 1.0): zero shift, cosine exactly 1
        assert out[1]["shift"] == 0.0 and out[2]["shift"] == 0.0
        assert out[1]["centroid_cos"] == 1.0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_category_gate_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch id) must overwrite its own
    verdict and state version — gate values and final counts identical
    to the single-delivery run (at-least-once safety)."""
    from etlhelper_spark.operators.drift_state import (
        read_category_state,
        streaming_category_gate,
    )

    feed = str(tmp_path / "feed")
    b0 = _cats(spark, ["a"] * 3 + ["b"])
    b1 = _cats(spark, ["a"] + ["b"] * 3)
    b0.coalesce(1).write.mode("overwrite").parquet(feed)
    import glob as g
    import os as o
    import time as t

    t0 = t.time() - 1000
    first = set(g.glob(feed + "/part-*"))
    for p in first:
        o.utime(p, (t0, t0))
    b1.coalesce(1).write.mode("append").parquet(feed)
    for p in set(g.glob(feed + "/part-*")) - first:
        o.utime(p, (t0 + 100, t0 + 100))

    def run(tag):
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        streaming_category_gate(
            stream,
            str(tmp_path / f"state_{tag}"),
            str(tmp_path / f"ckpt_{tag}"),
            str(tmp_path / f"gates_{tag}"),
            "src",
        )
        gates = {
            r["batch"]: (r["n_rows"], r["chi2_total"])
            for r in spark.read.parquet(
                str(tmp_path / f"gates_{tag}")
            ).collect()
        }
        state = {
            r["category"]: r["cnt"]
            for r in read_category_state(
                spark, str(tmp_path / f"state_{tag}"), 99
            ).collect()
        }
        return gates, state

    gates1, state1 = run("a")
    # replay batch 1 by hand against the drained state (same batch id)
    from etlhelper_spark.operators.drift_state import (
        category_counts_incremental,
        chi2_against_state,
    )

    chi_replay = chi2_against_state(
        b1, str(tmp_path / "state_a"), 1
    ).select("chi2_total").first()["chi2_total"]
    category_counts_incremental(b1, str(tmp_path / "state_a"), 1, "src")
    state_replayed = {
        r["category"]: r["cnt"]
        for r in read_category_state(
            spark, str(tmp_path / "state_a"), 99
        ).collect()
    }
    assert state_replayed == state1 == {"a": 4, "b": 4}
    assert chi_replay == gates1[1][1]
    assert gates1[1][0] == 4


# ---------------------------------------------------- r8 ADVICE regressions
def test_chi2_report_null_category_matches_itself(spark):
    """A NULL category present on BOTH sides is one contingency row
    (eqNullSafe join), not two zero-filled rows inflating chi2_total —
    category_counts_incremental's 'NULLs count under their own
    category' contract (r7 ADVICE, drift.py chi2_report)."""
    from etlhelper_spark.functions.drift import chi2_report

    a = spark.createDataFrame(
        [("x", 10), (None, 10)], "category string, cnt long"
    )
    b = spark.createDataFrame(
        [("x", 10), (None, 10)], "category string, cnt long"
    )
    rows = chi2_report(a, b).collect()
    assert len(rows) == 2  # x + the single matched NULL row
    by_cat = {r["category"]: r for r in rows}
    assert by_cat[None]["cnt_a"] == 10 and by_cat[None]["cnt_b"] == 10
    # identical distributions: zero drift, which the broken join
    # (NULL splitting into two one-sided rows) reports as nonzero
    assert rows[0]["chi2_total"] == 0.0


def test_chi2_report_null_one_sided_still_zero_fills(spark):
    from etlhelper_spark.functions.drift import chi2_report

    a = spark.createDataFrame(
        [("x", 10), (None, 5)], "category string, cnt long"
    )
    b = spark.createDataFrame([("x", 10)], "category string, cnt long")
    by_cat = {r["category"]: r for r in chi2_report(a, b).collect()}
    assert by_cat[None]["cnt_b"] == 0
    assert by_cat[None]["chi2_total"] > 0.0


def test_embedding_moments_ragged_batch_fails_loudly(spark, tmp_path):
    """Mixed vector lengths must raise (r7 ADVICE: a first-row-only
    dim check let ragged batches silently skew per-dimension means)."""
    from etlhelper_spark.operators.drift_state import (
        embedding_moments_incremental,
    )

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        embedding_moments_incremental(ragged, str(tmp_path / "st"), 0)
