"""functions/pipeline.py::prepare_training_tensors — the one-call
training chain: guard rails plus a small end-to-end shape check
(the full element-level gate is q287's oracle)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_guards(spark):
    from etlhelper_spark.functions.pipeline import (
        prepare_training_tensors,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    with pytest.raises(ValueError, match="odd"):
        prepare_training_tensors(d, n_shards=8)
    with pytest.raises(ValueError, match="budget_factor"):
        prepare_training_tensors(d, budget_factor=2.3)


def test_end_to_end_shape_and_invariants(spark):
    from etlhelper_spark.functions.pipeline import (
        prepare_training_tensors,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = prepare_training_tensors(
        d, chunk_size=16, pack_budget=64, n_shards=5
    ).collect()
    assert out
    for r in out:
        assert len(r["input_ids"]) == 64
        assert len(r["segment_ids"]) == 64
        assert len(r["position_ids"]) == 64
        assert r["pack_tokens"] + r["pad_tokens"] == 64
        # pad is a strict suffix with -1 in every array
        pt = r["pack_tokens"]
        assert all(x == -1 for x in r["input_ids"][pt:])
        assert all(x >= 0 for x in r["segment_ids"][:pt])
    # selection really subsets: fewer source docs than the corpus
    n_docs_packed = sum(r["n_docs"] for r in out)
    assert n_docs_packed > 0


def test_explicit_budgets_and_no_filter(spark):
    """budgets table path + filter_expr=None keeps every doc whose
    source is quoted at full size (factor-1 race admits everything
    in whole epochs... budget == total -> exactly one epoch)."""
    from etlhelper_spark.functions.pipeline import (
        prepare_training_tensors,
    )
    from etlhelper_spark.functions.util import literal_frame

    d = literal_frame(
        spark,
        [(1, "a", "x y z w"), (2, "a", "p q r s"), (3, "b", "m n")],
        "doc_id long, source string, text string",
    )
    budgets = literal_frame(
        spark, [("a", 8), ("b", 2)],
        "source string, budget_tokens long",
    )
    out = prepare_training_tensors(
        d, budgets=budgets, chunk_size=4, pack_budget=8, n_shards=3
    ).collect()
    assert sum(r["n_docs"] for r in out) == 3  # all docs, one epoch
