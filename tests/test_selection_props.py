"""Property-based hardening of the two-level epoch-repeat race
(functions/selection.py::repeat_to_budget): for ANY document/budget
shape, the Spark plan must equal the policy restated in pure Python —
sort by (md5(seed||id), id) per source, whole epochs = floor(budget /
total), admit the remainder while the running sum stays below it —
and hold the race invariants (planned tokens land in
[budget - max_doc, budget + max_doc), epochs dense from 0)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@st.composite
def corpus(draw):
    n_sources = draw(st.integers(min_value=1, max_value=3))
    docs = []
    did = 0
    for s in range(n_sources):
        for _ in range(draw(st.integers(min_value=1, max_value=8))):
            docs.append((did, f"s{s}", draw(
                st.integers(min_value=1, max_value=50))))
            did += 1
    factors = {
        f"s{s}": draw(st.floats(min_value=0.1, max_value=3.5))
        for s in range(n_sources)
    }
    return docs, factors


def _python_policy(docs, factors):
    out = set()
    by_src: dict[str, list] = {}
    for did, src, nt in docs:
        by_src.setdefault(src, []).append((did, nt))
    for src, rows in by_src.items():
        total = sum(nt for _d, nt in rows)
        budget = int(factors[src] * total)
        full, rem = budget // total, budget % total
        for did, nt in rows:
            for e in range(full):
                out.add((did, e))
        raced = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"rep:{r[0]}".encode()).hexdigest(),
                r[0],
            ),
        )
        cum = 0
        for did, nt in raced:
            if cum < rem:
                out.add((did, full))
            cum += nt
    return out


@pytest.mark.usefixtures("spark")
@given(corpus())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_race_matches_python_policy(spark, data):
    from etlhelper_spark.functions.selection import repeat_to_budget
    from etlhelper_spark.functions.util import literal_frame

    docs, factors = data
    df = literal_frame(
        spark, docs, "doc_id long, source string, nt long"
    )
    totals = {
        s: sum(nt for _d, src, nt in docs if src == s)
        for s in factors
    }
    budgets = literal_frame(
        spark,
        [(s, int(f * totals[s])) for s, f in factors.items()],
        "source string, budget_tokens long",
    )
    got = {
        (r["doc_id"], r["epoch"])
        for r in repeat_to_budget(
            df.repartition(3), budgets, tokens_col="nt",
            partial_buckets=16,
        ).collect()
    }
    assert got == _python_policy(docs, factors)
