"""Load/copy semantics (reference: test/integration/etl/test_etl_load.py
and test_etl_transform.py — round-trips, chunk sweeps, on_error counts,
empty input, golden INSERT SQL, transform styles)."""

import pytest

from etlhelper_spark import (
    DbParams,
    ETLHelperInsertError,
    copy_rows,
    copy_table_rows,
    dataframe_transform,
    executemany,
    fetchall,
    generate_insert_sql,
    load,
)


def region_rows(src_conn):
    return fetchall("SELECT * FROM region ORDER BY r_regionkey", src_conn)


def test_load_roundtrip(src_conn, dest_conn):
    rows = region_rows(src_conn)
    processed, failed = load("region_copy", dest_conn, rows)
    assert (processed, failed) == (5, 0)
    out = fetchall("SELECT * FROM region_copy ORDER BY r_regionkey", dest_conn)
    assert out == rows


@pytest.mark.parametrize("chunk_size", [1, 2, 3, 4])
def test_load_chunk_sizes(src_conn, dest_conn, chunk_size):
    rows = region_rows(src_conn)
    processed, failed = load("t", dest_conn, rows, chunk_size=chunk_size)
    assert (processed, failed) == (5, 0)
    assert len(fetchall("SELECT * FROM t", dest_conn)) == 5


def test_load_empty_and_none(dest_conn):
    assert load("t", dest_conn, []) == (0, 0)
    assert load("t", dest_conn, None) == (0, 0)


def test_load_generator_input(src_conn, dest_conn):
    gen = (r for r in region_rows(src_conn))
    processed, failed = load("t", dest_conn, gen)
    assert (processed, failed) == (5, 0)


def test_load_transform_applied(src_conn, dest_conn):
    def transform(chunk):
        return [{**r, "r_name": r["r_name"].title()} for r in chunk]

    load("t", dest_conn, region_rows(src_conn), transform=transform)
    out = fetchall("SELECT r_name FROM t ORDER BY r_name", dest_conn)
    assert out[0]["r_name"] == "Africa"


def test_load_on_error_collects_failed_rows(src_conn, dest_conn):
    # establish schema with a first chunk, then feed rows whose types
    # can't coerce -> those rows are dead-lettered, not fatal
    load("t", dest_conn, [{"id": 1, "value": 1.5}])
    errors = []
    rows = [
        {"id": 2, "value": 2.5},
        {"id": 3, "value": object()},  # unserializable
    ]
    processed, failed = executemany(
        "INSERT INTO t (id, value) VALUES (:id, :value)",
        dest_conn,
        rows,
        on_error=errors.extend,
        chunk_size=10,
    )
    assert processed == 2  # processed includes failed (reference contract)
    assert failed == 1
    assert len(errors) == 1
    assert errors[0].row["id"] == 3


def test_executemany_without_on_error_raises(dest_conn):
    load("t", dest_conn, [{"id": 1, "value": 1.5}])
    with pytest.raises(ETLHelperInsertError):
        executemany(
            "INSERT INTO t (id, value) VALUES (:id, :value)",
            dest_conn,
            [{"id": 2, "value": object()}],
        )


def test_copy_table_rows(src_conn, dest_conn):
    processed, failed = copy_table_rows("nation", src_conn, dest_conn)
    assert (processed, failed) == (25, 0)
    assert len(fetchall("SELECT * FROM nation", dest_conn)) == 25


def test_copy_table_rows_target_rename(src_conn, dest_conn):
    copy_table_rows("nation", src_conn, dest_conn, target="nation2")
    assert len(fetchall("SELECT * FROM nation2", dest_conn)) == 25


def test_copy_rows_with_query_and_df_transform(src_conn, dest_conn):
    @dataframe_transform
    def double_price(df):
        from pyspark.sql import functions as F

        return df.withColumn("o_totalprice", F.col("o_totalprice") * 2)

    processed, failed = copy_rows(
        "SELECT * FROM orders WHERE o_totalprice > 400000",
        src_conn,
        "INSERT INTO big_orders VALUES",
        dest_conn,
        transform=double_price,
    )
    assert failed == 0
    out = fetchall("SELECT min(o_totalprice) AS m FROM big_orders", dest_conn)
    assert out[0]["m"] > 800000


def test_copy_rows_chunk_transform(src_conn, dest_conn):
    def transform(chunk):
        return [
            {"n_name": r["n_name"].lower(), "n_regionkey": r["n_regionkey"]}
            for r in chunk
        ]

    processed, failed = copy_rows(
        "SELECT * FROM nation",
        src_conn,
        "INSERT INTO nation_lower VALUES",
        dest_conn,
        transform=transform,
    )
    assert processed == 25
    out = fetchall(
        "SELECT n_name FROM nation_lower ORDER BY n_name LIMIT 1", dest_conn
    )
    assert out[0]["n_name"] == out[0]["n_name"].lower()


# -- generate_insert_sql golden strings (reference:
#    test/integration/etl/test_etl_load.py:221-253) --------------------
class _FakeConn:
    def __init__(self, dbtype, **kw):
        self.db_params = DbParams(dbtype=dbtype, **kw)


PG = _FakeConn("POSTGRES", host="h", port=1, dbname="d", user="u")
SQLITE = _FakeConn("SQLITE", filename="/tmp/x.db")
MSSQL = _FakeConn(
    "MSSQL", host="h", port=1, dbname="d", user="u", odbc_driver="x"
)


def test_generate_insert_sql_dict_pg():
    assert generate_insert_sql("my_table", {"id": 1, "value": 1.0}, PG) == (
        "INSERT INTO my_table (id, value) VALUES (%(id)s, %(value)s)"
    )


def test_generate_insert_sql_namedtuple_pg():
    from collections import namedtuple

    Row = namedtuple("Row", ["id", "value"])
    assert generate_insert_sql("my_table", Row(1, 1.0), PG) == (
        "INSERT INTO my_table (id, value) VALUES (%s, %s)"
    )


def test_generate_insert_sql_dict_sqlite_named():
    assert generate_insert_sql("t", {"id": 1}, SQLITE) == (
        "INSERT INTO t (id) VALUES (:id)"
    )


def test_generate_insert_sql_dict_mssql_raises():
    with pytest.raises(ETLHelperInsertError, match="named parameters"):
        generate_insert_sql("t", {"id": 1}, MSSQL)


def test_generate_insert_sql_bad_table():
    from etlhelper_spark import ETLHelperBadIdentifierError

    with pytest.raises(ETLHelperBadIdentifierError):
        generate_insert_sql("bad; DROP", {"id": 1}, PG)
