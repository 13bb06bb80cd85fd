"""transformWithStateInPandas (PySpark 4.x StatefulProcessor) gate.

The operator's runtime needs google.protobuf (state-server protocol),
which this container lacks — so the equivalence test self-skips there
and the gate's guidance path is what's asserted. On an env with
protobuf the equivalence test runs for real.
"""

from __future__ import annotations

import tempfile

import pytest

from etlhelper_spark.streaming import (
    running_user_totals_tws,
    transform_with_state_available,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    transform_with_state_available(),
    reason="protobuf present - guidance path unreachable",
)
def test_missing_protobuf_raises_with_guidance(spark):
    with pytest.raises(ImportError, match="running_user_totals"):
        running_user_totals_tws(spark, SF_DIR, tempfile.mkdtemp())


@pytest.mark.skipif(
    not transform_with_state_available(),
    reason="google.protobuf not installed in this container",
)
def test_tws_equals_batch_aggregate(spark):
    from pyspark.sql import functions as F

    out = running_user_totals_tws(
        spark, SF_DIR, tempfile.mkdtemp(prefix="ehs_tws_")
    )
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count("*").alias("n_events"),
        )
    )
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
