#!/usr/bin/env bash
# Pre-commit guard: a test-only commit must never land unexercised.
#
# Runs (1) pytest --collect-only over the whole suite (~2s; catches the
# r8 class of failure where a bad decorator kills collection for ALL
# tests) and (2) the full test files touched in the index / working
# tree, so the code a commit modifies is actually executed before it
# ships.  Usage:  scripts/preflight.sh   (then commit if exit 0)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== preflight: collect-only over tests/ =="
python -m pytest tests/ --collect-only -q >/dev/null

touched=$( (git diff --name-only --diff-filter=d HEAD -- 'tests/*.py';
            git ls-files --others --exclude-standard -- 'tests/*.py') | sort -u)
if [ -n "$touched" ]; then
    echo "== preflight: running touched test files =="
    echo "$touched"
    # shellcheck disable=SC2086
    python -m pytest $touched -q
else
    echo "== preflight: no touched test files =="
fi

# The Arrow/pandas-UDF hot paths (applyInPandas/mapInPandas folds in
# packing, export, drift, and the ETL chunk transforms) run with
# FutureWarning promoted to an error, so the next pandas-major
# behavior change fails HERE instead of landing silently (VERDICT
# r11 #6 — the r10 pack-fold all-NA dtype warning was this class).
echo "== preflight: pandas-UDF suites under -W error::FutureWarning =="
python -m pytest tests/test_packing.py tests/test_packing_state.py \
    tests/test_export.py tests/test_drift.py tests/test_load_copy.py \
    -q -W error::FutureWarning

echo "preflight OK"
