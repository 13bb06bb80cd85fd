"""Job-level profile of one or more declared queries.

Runs each named query exactly like bench.py (same session factory,
same .count() action) after an untimed warm pass, with the Spark
event log enabled, then parses the event log for per-job wall-clock
durations: job id, duration, task count, and the first stage's call
site.  The output answers "where do the seconds of a lifecycle query
actually go" — job count, scheduling, write commits, collects —
which the SQL-plan view cannot show for multi-action queries.

Usage: python scripts/profile_query.py q244_ivfpq_rebalance [more...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query_name> [...]", file=sys.stderr)
        sys.exit(2)

    evdir = tempfile.mkdtemp(prefix="ehs_evlog_")

    from etlhelper_spark.plans import QUERIES
    from etlhelper_spark.plans.queries import clear_stage_caches
    from etlhelper_spark.session import get_session

    spark = get_session(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    marks: list[tuple[str, float, float, int]] = []
    for name in names:
        fn = QUERIES[name]
        clear_stage_caches()
        fn(spark, SF_DIR).count()  # untimed warm pass
        clear_stage_caches()
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        t1 = time.time()
        marks.append((name, t0, t1, n))
        print(f"== {name}: {t1 - t0:.2f}s ({n} rows)", file=sys.stderr)

    spark.stop()

    # parse the event log: one file under evdir
    logs = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if f.startswith(".") or f.endswith(".crc"):
                continue
            logs.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    stage_names: dict[int, str] = {}
    with open(max(logs, key=os.path.getmtime)) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                infos = ev.get("Stage Infos", [])
                ntasks = sum(s.get("Number of Tasks", 0) for s in infos)
                site = ""
                if infos:
                    site = infos[-1].get("Stage Name", "")
                jobs[jid] = {
                    "t0": ev["Submission Time"] / 1000.0,
                    "ntasks": ntasks,
                    "site": site,
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"] / 1000.0

    for name, t0, t1, n in marks:
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("t1") and t0 <= j["t0"] <= t1
        ]
        tot = sum(j["t1"] - j["t0"] for _, j in sel)
        print(
            f"\n== {name}: {t1 - t0:.2f}s wall, {len(sel)} jobs, "
            f"{tot:.2f}s in-job ({t1 - t0 - tot:.2f}s between), {n} rows =="
        )
        prev_end = t0
        for jid, j in sel:
            gap = j["t0"] - prev_end
            prev_end = max(prev_end, j["t1"])
            print(
                f"  job {jid}: {j['t1'] - j['t0']:6.3f}s "
                f"(+{gap:5.3f}s gap) tasks={j['ntasks']:<4d} {j['site'][:90]}"
            )


if __name__ == "__main__":
    main()
