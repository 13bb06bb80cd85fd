"""LIVE JDBC integration tests against embedded Apache Derby.

Every other dialect's JDBC coverage is golden-string only (no server
in the container); Derby ships inside the Spark distribution, so these
tests drive the REAL paths end-to-end: Spark JDBC reader (query +
dbtable), batch writer, DriverManager DDL pass-through, catalog
table_info, parameter binding, and a cross-backend copy.

Identifier note: Spark's JDBC writer quotes column names, so tables it
creates have case-sensitive lowercase columns — queries here quote
them the same way. Reference parity: SURVEY §2.1/§2.2/§2.5 operators
on a real database rather than the files backend.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from etlhelper_spark import connect, connect_files
from etlhelper_spark.db_params import DbParams
from etlhelper_spark.exceptions import ETLHelperExtractError
from etlhelper_spark.operators import (
    copy_table_rows,
    execute,
    executemany,
    fetchall,
    fetchone,
    iter_rows,
    load,
)

pytestmark = pytest.mark.skipif(
    not glob.glob("/opt/spark/jars/derby-*.jar"),
    reason="Derby jars not on the Spark classpath",
)


@pytest.fixture(scope="module")
def derby_conn(spark):
    d = tempfile.mkdtemp(prefix="ehs_derby_")
    db_params = DbParams(dbtype="derby", filename=os.path.join(d, "db"))
    conn = connect(db_params, spark=spark)
    yield conn
    shutil.rmtree(d, ignore_errors=True)


def test_load_and_fetch_roundtrip(derby_conn):
    rows = [{"id": i, "name": f"n{i}"} for i in range(10)]
    processed, failed = load("people", derby_conn, rows)
    assert (processed, failed) == (10, 0)
    got = fetchall(
        'SELECT "id", "name" FROM people WHERE "id" >= ? ORDER BY "id"',
        derby_conn,
        parameters=(7,),
    )
    assert got == [
        {"id": 7, "name": "n7"},
        {"id": 8, "name": "n8"},
        {"id": 9, "name": "n9"},
    ]
    assert fetchone('SELECT count(*) AS "n" FROM people', derby_conn)["n"] == 10


def test_executemany_against_live_table(derby_conn):
    load("em_tbl", derby_conn, [{"id": 0, "name": "seed"}])
    processed, failed = executemany(
        "INSERT INTO em_tbl (id, name) VALUES (?, ?)",
        derby_conn,
        [(1, "a"), (2, "b"), (3, "c")],
    )
    assert (processed, failed) == (3, 0)
    assert (
        fetchone('SELECT count(*) AS "n" FROM em_tbl', derby_conn)["n"] == 4
    )


def test_execute_ddl_and_error_wrapping(derby_conn):
    # DriverManager pass-through: Spark's JDBC source has no DDL API
    execute(
        'CREATE TABLE ddl_made ("x" INT NOT NULL, "y" VARCHAR(5))',
        derby_conn,
    )
    load("ddl_made", derby_conn, [{"x": 1, "y": "ok"}])
    assert fetchall('SELECT "x", "y" FROM ddl_made', derby_conn) == [
        {"x": 1, "y": "ok"}
    ]
    with pytest.raises(ETLHelperExtractError):
        fetchall("SELECT nope FROM does_not_exist", derby_conn)


def test_table_info_live_catalog(derby_conn):
    from etlhelper_spark.catalog import table_info

    execute(
        'CREATE TABLE cat_tbl ("a" INT NOT NULL, "b" VARCHAR(9))',
        derby_conn,
    )
    cols = table_info("cat_tbl", derby_conn)
    by_name = {c.name: c for c in cols}
    assert set(by_name) == {"a", "b"}
    assert str(by_name["a"].not_null) in ("1", "True", "true")


def test_iter_rows_streams_chunks(derby_conn):
    load("stream_tbl", derby_conn, [{"id": i} for i in range(100)])
    seen = [
        r["id"]
        for r in iter_rows(
            'SELECT "id" FROM stream_tbl', derby_conn, chunk_size=17
        )
    ]
    assert sorted(seen) == list(range(100))


def test_copy_table_rows_jdbc_to_files(spark, derby_conn):
    load("copy_src", derby_conn, [{"id": i, "v": i * 1.5} for i in range(20)])
    dest_dir = tempfile.mkdtemp(prefix="ehs_derby_copy_")
    try:
        dest = connect_files(dest_dir, spark=spark)
        copy_table_rows("copy_src", derby_conn, dest)
        out = dest.table_dataframe("copy_src")
        assert out.count() == 20
        assert {r["id"] for r in out.collect()} == set(range(20))
    finally:
        shutil.rmtree(dest_dir, ignore_errors=True)


def test_parallel_partitioned_scan(spark, derby_conn):
    load("par_tbl", derby_conn, [{"id": i, "v": i % 7} for i in range(200)])
    df = derby_conn.table_dataframe(
        "par_tbl",
        partition_column='"id"',
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200
