"""DbParams validation / env construction / copy / repr
(reference: test/unit/test_db_params.py:14-173)."""

import pytest

from etlhelper_spark import DbParams, ETLHelperDbParamsError


def make_pg(**over):
    params = dict(dbtype="POSTGRES", host="localhost", port=5432,
                  dbname="etlhelper", user="admin")
    params.update(over)
    return DbParams(**params)


def test_attribute_and_dict_access():
    p = make_pg()
    assert p.host == "localhost"
    assert p["port"] == 5432


def test_unknown_dbtype_rejected():
    with pytest.raises(ETLHelperDbParamsError, match="not recognised"):
        DbParams(dbtype="NOT_A_DB", host="h")


def test_missing_required_param_rejected():
    with pytest.raises(ETLHelperDbParamsError, match="not set"):
        DbParams(dbtype="POSTGRES", host="localhost", port=5432)


def test_extra_param_rejected():
    with pytest.raises(ETLHelperDbParamsError, match="Invalid parameter"):
        make_pg(bananas=7)


def test_from_environment(monkeypatch):
    monkeypatch.setenv("ETLHelper_dbtype", "SQLITE")
    monkeypatch.setenv("ETLHelper_filename", "/tmp/db.sqlite")
    p = DbParams.from_environment()
    assert p.dbtype == "SQLITE"
    assert p.filename == "/tmp/db.sqlite"


def test_from_environment_missing_dbtype(monkeypatch):
    monkeypatch.delenv("ETLHelper_dbtype", raising=False)
    with pytest.raises(ETLHelperDbParamsError, match="dbtype"):
        DbParams.from_environment()


def test_copy_is_validated_and_equal():
    p = make_pg()
    q = p.copy()
    assert q == p
    assert isinstance(q, DbParams)


def test_repr():
    p = make_pg()
    assert "DbParams(dbtype='POSTGRES'" in repr(p)
    assert "host='localhost'" in repr(p)


def test_is_reachable_unreachable_host():
    p = make_pg(host="127.0.0.1", port=1)  # nothing listens on port 1
    assert p.is_reachable(timeout=1) is False


def test_sqlite_not_reachable_api():
    p = DbParams(dbtype="SQLITE", filename="/tmp/db.sqlite")
    with pytest.raises(ValueError):
        p.is_reachable()


def test_jdbc_urls():
    assert make_pg().jdbc_url() == "jdbc:postgresql://localhost:5432/etlhelper"
    ora = DbParams(dbtype="ORACLE", host="h", port=1521, dbname="orcl", user="u")
    assert ora.jdbc_url() == "jdbc:oracle:thin:@//h:1521/orcl"
    ms = DbParams(dbtype="MSSQL", host="h", port=1433, dbname="d", user="u",
                  odbc_driver="ODBC Driver 18 for SQL Server")
    assert ms.jdbc_url() == "jdbc:sqlserver://h:1433;databaseName=d"
    sq = DbParams(dbtype="SQLITE", filename="/tmp/x.db")
    assert sq.jdbc_url() == "jdbc:sqlite:/tmp/x.db"


def test_password_from_env_only(monkeypatch):
    p = make_pg()
    monkeypatch.delenv("TEST_PG_PASSWORD", raising=False)
    with pytest.raises(ETLHelperDbParamsError, match="is not set"):
        p.get_password("TEST_PG_PASSWORD")
    monkeypatch.setenv("TEST_PG_PASSWORD", "s3cret")
    assert p.get_password("TEST_PG_PASSWORD") == "s3cret"


def test_connection_strings(monkeypatch):
    monkeypatch.setenv("TEST_PG_PASSWORD", "pw")
    p = make_pg()
    assert "password=pw" in p.get_connection_string("TEST_PG_PASSWORD")
    assert p.get_sqlalchemy_connection_string("TEST_PG_PASSWORD") == (
        "postgresql://admin:pw@localhost:5432/etlhelper"
    )


def test_from_conn_dispatch_sqlite():
    """Reference DB_HELPER_FACTORY.from_conn parity
    (db_helper_factory.py:46-60): a raw DB-API connection resolves its
    dialect by str(conn.__class__)."""
    import sqlite3

    from etlhelper_spark.dialects import SQLiteDialect, from_conn

    conn = sqlite3.connect(":memory:")
    try:
        assert isinstance(from_conn(conn), SQLiteDialect)
    finally:
        conn.close()


def test_from_conn_rejects_non_connection():
    import pytest as _pytest

    from etlhelper_spark.dialects import from_conn
    from etlhelper_spark.exceptions import ETLHelperHelperError

    with _pytest.raises(ETLHelperHelperError):
        from_conn(object())


def test_from_conn_unknown_class():
    import pytest as _pytest

    from etlhelper_spark.dialects import from_conn
    from etlhelper_spark.exceptions import ETLHelperHelperError

    class FakeConn:
        def cursor(self):
            return None

    with _pytest.raises(ETLHelperHelperError):
        from_conn(FakeConn())
