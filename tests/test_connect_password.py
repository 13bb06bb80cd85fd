"""connect(db_params, password_variable=...) must keep working for
every later read/write on the connection (the reference's canonical
connect(db_params, 'ORACLE_PASSWORD') pattern, db_helper.py:75-92) —
the variable NAME persists on the connection; each operation
re-resolves it."""

import pytest

from etlhelper_spark.connect import connect
from etlhelper_spark.db_params import DbParams
from etlhelper_spark.exceptions import (
    ETLHelperBadIdentifierError,
    ETLHelperDbParamsError,
)


@pytest.fixture()
def pg_params():
    return DbParams(
        dbtype="PG", host="localhost", port=5432, dbname="etl", user="u"
    )


def test_connect_persists_password_variable(spark, pg_params, monkeypatch):
    monkeypatch.setenv("TEST_PG_PASSWORD", "s3cret")
    conn = connect(pg_params, "TEST_PG_PASSWORD", spark=spark)
    assert conn.password_variable == "TEST_PG_PASSWORD"
    # what every read/write path calls internally — must resolve the
    # stored variable, not raise get_password(None)
    props = conn.db_params.jdbc_properties(conn.password_variable)
    assert props["password"] == "s3cret"


def test_connect_missing_env_var_fails_fast(spark, pg_params, monkeypatch):
    monkeypatch.delenv("NO_SUCH_PASSWORD_VAR", raising=False)
    with pytest.raises(ETLHelperDbParamsError):
        connect(pg_params, "NO_SUCH_PASSWORD_VAR", spark=spark)


@pytest.mark.parametrize(
    "bad",
    ["../escape", "a/b", "a.b", "a.b.c", 'x"; DROP TABLE t; --'],
)
def test_write_dataframe_rejects_bad_table_names(spark, tmp_path, bad):
    """files backend: names map to file paths — single identifier only
    (dots included: '../escape' or 'a.b' would otherwise be joined
    into the write path)."""
    from etlhelper_spark.connect import connect_files

    conn = connect_files(str(tmp_path), spark=spark)
    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(ETLHelperBadIdentifierError):
        conn.write_dataframe(df, bad)


def test_jdbc_write_allows_schema_qualified(spark, pg_params, monkeypatch):
    """JDBC accepts schema.table (validated per part) — the name must
    clear validation and reach the writer; the eventual connection
    refusal proves validation passed."""
    from etlhelper_spark.connect import SparkConnection

    monkeypatch.setenv("TEST_PG_PASSWORD", "x")
    conn = SparkConnection(
        spark, "jdbc", db_params=pg_params,
        password_variable="TEST_PG_PASSWORD",
    )
    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(Exception) as exc_info:
        conn.write_dataframe(df, "myschema.mytable")
    assert not isinstance(exc_info.value, ETLHelperBadIdentifierError)
