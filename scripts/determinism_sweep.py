"""Determinism sweep: the full correctness replica under two executor
counts, with the per-query Spark result hashes diffed.

Shuffle-partition count and task parallelism change aggregation order,
partial-aggregate merge order, and AQE decisions — any query whose
result depends on them (unstable float reduction order without the
rounding discipline, nondeterministic tie-breaks, first()-style aggs)
hashes differently between local[4] and local[32]. This script makes
that invariant a committed per-round artifact instead of a claim.

Usage: python scripts/determinism_sweep.py [out_path]
Writes a report (default DETERMINISM.txt) and exits non-zero on any
failed run or hash divergence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_replica(cpus: str, hash_path: str) -> tuple[int, str]:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = cpus
    env["SPARK_GRAFT_HASH_OUT"] = hash_path
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/check_correctness.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-1:])
    return proc.returncode, tail


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "DETERMINISM.txt"
    )
    lines = []
    hashes = {}
    rc_total = 0
    for cpus in ("4", "32"):
        hp = tempfile.mktemp(prefix=f"ehs_hashes_{cpus}_")
        rc, tail = run_replica(cpus, hp)
        rc_total |= rc
        lines.append(f"local[{cpus}]: {tail} (rc={rc})")
        # a replica that died before writing its hash file must still
        # produce a diagnosable REPORT (with the failure recorded and
        # a non-zero exit), not an unhandled traceback
        if os.path.exists(hp):
            with open(hp) as fh:
                hashes[cpus] = json.load(fh)
            os.unlink(hp)
        else:
            hashes[cpus] = {}
            lines.append(
                f"local[{cpus}]: replica wrote no hash file — run failed"
            )
            rc_total |= 4
    names = sorted(set(hashes["4"]) | set(hashes["32"]))
    diverged = [
        n
        for n in names
        if hashes["4"].get(n) != hashes["32"].get(n)
    ]
    lines.append(f"queries hashed: {len(names)}")
    if diverged:
        lines.append(f"HASH DIVERGENCE ({len(diverged)}): {diverged}")
        rc_total |= 2
    else:
        lines.append("all hashes identical across local[4] and local[32]")
    report = "\n".join(lines) + "\n"
    sys.stdout.write(report)
    with open(out_path, "w") as fh:
        fh.write(report)
    return rc_total


if __name__ == "__main__":
    raise SystemExit(main())
