"""Apache Derby (embedded) dialect.

Not in the reference's four dialects (db_helper_factory.py registers
Postgres/Oracle/MSSQL/SQLite) — added because Derby ships inside every
Spark distribution (it backs the Hive metastore), which makes it the
one JDBC database that is ALWAYS live-testable wherever Spark runs.
The integration tests use it to exercise the real JDBC read/write/DDL
paths that the other dialects can only cover with golden strings when
no server is reachable. Shape mirrors the SQLite dialect (file-backed,
no credentials).
"""

from __future__ import annotations

from .base import Dialect


class DerbyDialect(Dialect):
    dbtype = "DERBY"
    required_params = {"filename"}
    passwordless = True
    # binding happens at the API layer (typed-literal rendering /
    # DataFrame batch writes), so named style is accepted like SQLite's
    paramstyle = "qmark"
    named_paramstyle = "named"
    positional_paramstyle = "qmark"
    jdbc_driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

    # Derby exposes its catalog via SYS tables; columns aliased to the
    # reference's Column fields (name/type/not_null/has_default)
    table_info_query = """
        SELECT c.COLUMNNAME AS name,
               CAST(c.COLUMNDATATYPE AS VARCHAR(128)) AS type,
               CASE WHEN CAST(c.COLUMNDATATYPE AS VARCHAR(128))
                         LIKE '%NOT NULL' THEN 1 ELSE 0 END
                   AS not_null,
               CASE WHEN c.COLUMNDEFAULT IS NOT NULL THEN 1 ELSE 0 END
                   AS has_default
        FROM SYS.SYSCOLUMNS c
        JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
        WHERE t.TABLENAME = UPPER('{table}')
    """

    def jdbc_url(self, db_params) -> str:
        # ;create=true makes first contact create the database dir,
        # matching SQLite's touch-on-open behavior
        return f"jdbc:derby:{db_params['filename']};create=true"

    def connection_string(self, db_params, password: str) -> str:
        return f"{db_params['filename']}"

    def sqlalchemy_url(self, db_params, password: str) -> str:
        return f"derby:///{db_params['filename']}"
