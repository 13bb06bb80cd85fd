"""Bisect harness for the r8 IVFPQ lifecycle slowdown (VERDICT r8 #2).

Times ONLY the three flagged items — the shared IVFPQ index build,
q234_ivfpq_append, q240_stream_ivfpq_ingest — at sf0.1 with the same
session shape as bench.py (warm JVM, memoized stages flushed between
passes, min-of-N).  Run it from a checkout of EITHER revision:

    python scripts/bisect_ivfpq.py          # 3 passes by default

Comparing its output across `git worktree add /tmp/r7 <r7-sha>` and
HEAD on the SAME host in the SAME session window separates host drift
from code regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("BISECT_PASSES", "3"))


def main() -> None:
    from etlhelper_spark.plans import QUERIES
    from etlhelper_spark.plans.queries import (
        clear_stage_caches,
        ivfpq_index_cached,
    )
    from etlhelper_spark.session import get_session

    spark = get_session("bisect-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    targets = ["q234_ivfpq_append", "q240_stream_ivfpq_ingest"]

    # bench.py's shape: a small throwaway build compiles the
    # assignment/encode codegen, then the REAL shared build is timed
    # once (it is memoized for the rest of the session — per-pass
    # timings of ivfpq_index_cached would measure a dict lookup)
    import shutil
    import tempfile

    from etlhelper_spark.functions.ivfpq import build_ivfpq_index

    _warm = tempfile.mkdtemp(prefix="ehs_bisect_warm_")
    build_ivfpq_index(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(512),
        os.path.join(_warm, "idx"),
        nlist=8,
        m_sub=4,
        k_codes=8,
    )
    shutil.rmtree(_warm, ignore_errors=True)
    t0 = time.time()
    ivfpq_index_cached(spark, SF_DIR)
    build_sec = round(time.time() - t0, 3)
    print(f"# ivfpq_index_build: {build_sec:.2f}s", file=sys.stderr)

    # one untimed warm pass: codegen + Python workers + streaming machinery
    for name in targets:
        QUERIES[name](spark, SF_DIR).count()

    runs: dict[str, list[float]] = {"ivfpq_build": [build_sec]}
    for name in targets:
        runs[name] = []
    for p in range(PASSES):
        clear_stage_caches()
        for name in targets:
            t0 = time.time()
            n = QUERIES[name](spark, SF_DIR).count()
            dt = round(time.time() - t0, 3)
            runs[name].append(dt)
            print(f"# pass {p+1} {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    import subprocess

    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    print(json.dumps({
        "sha": sha,
        "min": {k: min(v) for k, v in runs.items()},
        "runs": runs,
    }))


if __name__ == "__main__":
    main()
