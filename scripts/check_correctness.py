"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and its
oracle_sql() in DuckDB on the same parquet tables; compares row count,
sorted column names, and an order-insensitive value hash. Queries with
no oracle get the rows-only check.

Usage: python scripts/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        return canon(f)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def result_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from etlhelper_spark.session import get_session

    only = set(sys.argv[1:])
    spark = get_session("correctness_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    # SPARK_GRAFT_HASH_OUT: write {query: spark-result-hash} for the
    # determinism sweep (scripts/determinism_sweep.py runs this replica
    # under different CPU counts and diffs the hash maps)
    hash_out = os.environ.get("SPARK_GRAFT_HASH_OUT")
    spark_hashes: dict[str, str] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            spark_cols = list(df.columns)
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        spark_hashes[name] = result_hash(spark_cols, spark_rows)
        if name not in oracles:
            print(
                f"OK?  {name}: rows-only check, {len(spark_rows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
            n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            oracle_cols = [d[0] for d in rel.description]
            # rel.types, not description: the DB-API typecode is the
            # generic 'NUMBER' for every numeric, which would make the
            # HUGEINT guard below dead code
            oracle_types = [str(t) for t in rel.types]
            oracle_rows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            n_fail += 1
            continue

        problems = []
        # DuckDB HUGEINT (int128, e.g. from un-cast integer sum()) hashes
        # differently in the driver's canonicalizer than Spark BIGINT even
        # when values agree — treat it as a failure here so the class is
        # caught before the driver sees it.
        for c, t in zip(oracle_cols, oracle_types):
            if "HUGEINT" in t.upper() or "INT128" in t.upper():
                problems.append(
                    f"oracle column {c!r} is {t} — CAST it to BIGINT"
                )
        if len(spark_rows) != len(oracle_rows):
            problems.append(
                f"rowcount {len(spark_rows)} != {len(oracle_rows)}"
            )
        if sorted(spark_cols) != sorted(oracle_cols):
            problems.append(
                f"columns {sorted(spark_cols)} != {sorted(oracle_cols)}"
            )
        if not problems:
            hs = result_hash(spark_cols, spark_rows)
            ho = result_hash(oracle_cols, oracle_rows)
            if hs != ho:
                problems.append("value hash mismatch")
                # show a diff sample
                order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                order_o = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in spark_rows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in oracle_rows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  oracle: {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(
                f"OK   {name}: {len(spark_rows)} rows match "
                f"({time.time() - t0:.1f}s)"
            )
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if hash_out:
        import json

        with open(hash_out, "w") as fh:
            json.dump(spark_hashes, fh, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
