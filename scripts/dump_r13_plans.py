"""Dump .explain('formatted') for named queries into plans/r13/.

Usage: python scripts/dump_r13_plans.py <suffix> <query> [...]
  suffix: 'before' or 'after'

For multi-action lifecycle queries the dumped plan is the FINAL
returned frame's (the only plan a DataFrame can carry); the job-count
evidence for lifecycle-internal changes lives in OPTIMIZATION_r13.md
(scripts/profile_query.py output).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r13",
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from etlhelper_spark.plans import QUERIES
    from etlhelper_spark.session import get_session

    spark = get_session("dump_r13_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
