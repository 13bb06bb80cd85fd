"""Property-based hardening of the next-fit packing kernel
(functions/packing.py::_next_fit) — pure Python, no Spark jobs, so
hypothesis can hammer it: for ANY token sequence, ANY budget, and ANY
segmentation into batches, folding the segments through the carried
cursor must equal one fold of the whole sequence (the
incremental-equals-batch contract pack_incremental rides on), and the
fold invariants (budget, running-sum offsets, monotone pack ids, no
empty packs) must hold."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etlhelper_spark.functions.packing import _next_fit


@st.composite
def seq_and_cuts(draw):
    budget = draw(st.integers(min_value=3, max_value=40))
    n = draw(st.integers(min_value=0, max_value=60))
    mode = draw(st.sampled_from(["error", "own_pack"]))
    hi = budget if mode == "error" else budget * 2
    toks = [
        draw(st.integers(min_value=1, max_value=hi)) for _ in range(n)
    ]
    n_cuts = draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(
        draw(st.integers(min_value=0, max_value=n)) for _ in range(n_cuts)
    )
    return budget, toks, cuts, mode


def _fold_whole(toks, budget, mode):
    return _next_fit(
        toks, pd.Series(range(len(toks))), budget, mode
    )


@given(seq_and_cuts())
@settings(max_examples=300, deadline=None)
def test_segmented_fold_equals_single_fold(case):
    budget, toks, cuts, mode = case
    packs_w, offs_w, *_ = _fold_whole(toks, budget, mode)
    bounds = [0] + cuts + [len(toks)]
    packs_s, offs_s = [], []
    pack, fill, first = 0, 0, True
    for a, b in zip(bounds, bounds[1:]):
        seg = toks[a:b]
        p, o, pack, fill, first = _next_fit(
            seg,
            pd.Series(range(a, b)),
            budget,
            mode,
            pack=pack,
            fill=fill,
            first=first,
        )
        packs_s.extend(p)
        offs_s.extend(o)
    assert packs_s == packs_w
    assert offs_s == offs_w


@given(seq_and_cuts())
@settings(max_examples=300, deadline=None)
def test_fold_invariants(case):
    budget, toks, cuts, mode = case
    packs, offs, last_pack, last_fill, first = _fold_whole(
        toks, budget, mode
    )
    # pack ids are nondecreasing and dense (no empty packs)
    assert packs == sorted(packs)
    assert len(set(packs)) == (packs[-1] + 1 if packs else 0)
    # offsets are the running token sums within each pack, and in
    # error mode no pack exceeds the budget
    fills: dict[int, int] = {}
    for p, o, t in zip(packs, offs, toks):
        assert o == fills.get(p, 0)
        fills[p] = o + t
    if mode == "error":
        assert all(v <= budget for v in fills.values())
    # own_pack: any over-budget pack contains exactly one document
    if mode == "own_pack":
        from collections import Counter

        sizes = Counter(packs)
        for p, v in fills.items():
            if v > budget:
                assert sizes[p] == 1
    # the returned cursor matches the last pack's fill
    if packs:
        assert last_pack == packs[-1]
        assert last_fill == fills[packs[-1]]
        assert first is False
    else:
        assert (last_pack, last_fill, first) == (0, 0, True)
