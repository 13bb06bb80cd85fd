"""Property-based hardening of the incremental dedup state machine:
for ANY corpus, ANY batch partitioning, ANY interleaving of replays
and compactions, the sequential applies must equal the full-corpus
first-seen recompute. Spark jobs per example are expensive, so the
strategy space is kept small and example counts low — the value is in
the adversarial interleavings, not the corpus size.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from etlhelper_spark.operators.dedup_state import (
    compact_dedup_state,
    dedup_exact_incremental,
)

# small vocabulary → heavy duplication pressure, plus whitespace
# variants that must normalize equal
TEXTS = [
    "alpha beta", "alpha  beta", " alpha beta ", "gamma", "delta delta",
    "Gamma", "epsilon", "",
]


@st.composite
def corpus_and_plan(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    docs = [(i, draw(st.sampled_from(TEXTS))) for i in range(n)]
    n_batches = draw(st.integers(min_value=1, max_value=4))
    assignment = [
        draw(st.integers(min_value=0, max_value=n_batches - 1))
        for _ in range(n)
    ]
    # after each batch: 0 = nothing, 1 = compact, 2 = replay the batch,
    # 3 = replay then compact
    actions = [
        draw(st.integers(min_value=0, max_value=3))
        for _ in range(n_batches)
    ]
    return docs, n_batches, assignment, actions


@given(corpus_and_plan())
@settings(max_examples=12, deadline=None)
def test_any_batching_equals_first_seen_recompute(spark, plan):
    docs, n_batches, assignment, actions = plan
    state = tempfile.mkdtemp(prefix="ehs_prop_state_")
    try:
        got: dict = {}
        for b in range(n_batches):
            rows = [
                (i, t) for (i, t), a in zip(docs, assignment) if a == b
            ]
            if not rows:
                continue
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            verdict = {
                r["id"]: (r["survivor_id"], r["kept"])
                for r in dedup_exact_incremental(batch, state, b).collect()
            }
            if actions[b] in (2, 3):  # at-least-once replay
                verdict_r = {
                    r["id"]: (r["survivor_id"], r["kept"])
                    for r in dedup_exact_incremental(
                        batch, state, b
                    ).collect()
                }
                assert verdict_r == verdict
            got.update(verdict)
            if actions[b] in (1, 3):
                compact_dedup_state(spark, state, "exact")
        # reference: pure-python first-seen over (batch, id)
        import re

        def fp(t):
            return re.sub(r"\s+", " ", t.strip().lower())

        first: dict = {}
        for (i, t), a in zip(docs, assignment):
            k = fp(t)
            if k not in first or (a, i) < first[k]:
                first[k] = (a, i)
        want = {
            i: (first[fp(t)][1], i == first[fp(t)][1])
            for (i, t) in docs
        }
        assert got == want
    finally:
        shutil.rmtree(state, ignore_errors=True)
