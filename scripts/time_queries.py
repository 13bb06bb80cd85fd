"""Isolated min-of-N timing for a subset of declared queries.

Mirrors bench.py's steady-state methodology (same session factory,
untimed warm pass, stage caches flushed before every timed pass,
count() action) but over just the named queries — the A/B tool for
optimization work: run it from two worktrees on an idle machine and
compare per-query minima.

Usage: python scripts/time_queries.py [-n PASSES] q244_ivfpq_rebalance [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n_passes = 2
    if args and args[0] == "-n":
        n_passes = int(args[1])
        args = args[2:]
    names = args
    if not names:
        print("usage: time_queries.py [-n N] <query> [...]", file=sys.stderr)
        sys.exit(2)

    from etlhelper_spark.plans import QUERIES
    from etlhelper_spark.plans.queries import clear_stage_caches
    from etlhelper_spark.session import get_session

    spark = get_session("time_queries")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warm pass
    clear_stage_caches()
    for name in names:
        QUERIES[name](spark, SF_DIR).count()

    runs: dict[str, list[float]] = {n: [] for n in names}
    for p in range(n_passes):
        clear_stage_caches()
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).count()
            dt = round(time.time() - t0, 3)
            runs[name].append(dt)
            print(f"# pass {p+1}/{n_passes} {name}: {dt:.2f}s", file=sys.stderr)
    out = {n: min(ts) for n, ts in runs.items()}
    out["__total__"] = round(sum(out.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
