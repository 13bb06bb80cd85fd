"""golden_records (operators/survivorship.py) + logit_score
(functions/calibrate.py): field-level survivorship policy, provenance,
tie-breaks, partition invariance, and literal-weight scoring."""

import math

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.calibrate import logit_score, logit_train
from etlhelper_spark.operators.survivorship import golden_records

ROWS = [
    # cluster 1: phone latest v=3 from web; bal only on crm
    (1, 10, "crm", 1, None, 100.0),
    (1, 11, "web", 3, "W-555", None),
    (1, 12, "app", 2, "A-555", None),
    # cluster 2: version tie v=5 app vs crm -> crm (priority 1) wins
    (2, 20, "app", 5, "A-777", None),
    (2, 21, "crm", 5, "C-777", None),
    # cluster 3: tie v, same UNNAMED source -> lowest record id wins
    (3, 30, "zzz", 1, "Z-1", 5.0),
    (3, 31, "zzz", 1, "Z-2", 6.0),
]
SCHEMA = "ck long, rid long, src string, v long, phone string, bal double"
PRIO = {"crm": 1, "web": 2, "app": 3}


@pytest.fixture(scope="module")
def recs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _collect(df):
    return {
        r["cluster_id"]: r.asDict() for r in df.collect()
    }


def test_survivorship_policy_and_provenance(spark, recs):
    g = _collect(
        golden_records(recs, "ck", "rid", ["phone", "bal"], "v", "src", PRIO)
    )
    # latest non-null wins
    assert (g[1]["phone"], g[1]["phone__src_id"], g[1]["phone__source"]) == (
        "W-555", 11, "web",
    )
    # null fields skipped entirely: bal survives from the only holder
    assert (g[1]["bal"], g[1]["bal__src_id"]) == (100.0, 10)
    # version tie -> source priority
    assert (g[2]["phone"], g[2]["phone__source"]) == ("C-777", "crm")
    # all-null field -> null survivor, null provenance
    assert g[2]["bal"] is None and g[2]["bal__src_id"] is None
    # unnamed source ties -> record id asc
    assert (g[3]["phone"], g[3]["phone__src_id"]) == ("Z-1", 30)
    assert g[3]["bal"] == 5.0
    assert [g[c]["n_records"] for c in (1, 2, 3)] == [3, 2, 2]


def test_survivorship_partition_invariant(spark, recs):
    a = sorted(
        map(tuple, golden_records(
            recs, "ck", "rid", ["phone", "bal"], "v", "src", PRIO
        ).collect())
    )
    b = sorted(
        map(tuple, golden_records(
            recs.repartition(7), "ck", "rid", ["phone", "bal"], "v",
            "src", PRIO,
        ).collect())
    )
    assert a == b


def test_unnamed_source_ranks_after_named(spark):
    # same version: named 'web' (prio 2) must beat unnamed 'mystery'
    df = spark.createDataFrame(
        [(1, 5, "mystery", 7, "M", None), (1, 6, "web", 7, "W", None)],
        SCHEMA,
    )
    g = _collect(
        golden_records(df, "ck", "rid", ["phone"], "v", "src", PRIO)
    )
    assert (g[1]["phone"], g[1]["phone__source"]) == ("W", "web")


def test_priority_requires_source_col(spark, recs):
    with pytest.raises(ValueError, match="source_col"):
        golden_records(recs, "ck", "rid", ["phone"], "v", None, PRIO)
    # without source at all: version then id ordering only
    g = _collect(golden_records(recs, "ck", "rid", ["phone"], "v"))
    assert g[1]["phone"] == "W-555"
    assert "phone__source" not in g[1]
    assert g[2]["phone__src_id"] == 20  # v tie -> id asc, no priority


def test_logit_score_matches_manual_sigmoid(spark):
    df = spark.createDataFrame(
        [(i, i / 10.0, float(i % 2)) for i in range(20)],
        "id long, x1 double, y double",
    )
    w = logit_train(df, ["x1"], "y", rounds=2)
    wm = {r["term"]: r["weight"] for r in w.collect()}
    got = {
        r["id"]: r["score"]
        for r in logit_score(df, w, ["x1"]).collect()
    }
    for i in range(20):
        z = wm["__bias__"] + wm["x1"] * (i / 10.0)
        assert got[i] == pytest.approx(1.0 / (1.0 + math.exp(-z)), abs=1e-6)


def test_logit_score_missing_term_raises(spark):
    df = spark.createDataFrame([(1, 0.5)], "id long, x1 double")
    w = spark.createDataFrame(
        [("__bias__", 0.1)], "term string, weight double"
    )
    with pytest.raises(ValueError, match="missing terms"):
        logit_score(df, w, ["x1"])
