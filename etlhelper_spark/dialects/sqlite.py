"""SQLite dialect (reference: etlhelper/db_helpers/sqlite.py)."""

from __future__ import annotations

from .base import Dialect


class SQLiteDialect(Dialect):
    dbtype = "SQLITE"
    # reference: db_helpers/sqlite.py:32
    required_params = {"filename"}
    passwordless = True
    paramstyle = "qmark"
    named_paramstyle = "named"
    positional_paramstyle = "qmark"
    jdbc_driver = "org.sqlite.JDBC"

    # reference: db_helpers/sqlite.py:18-28 (pragma_table_info)
    table_info_query = """
        SELECT name, type, "notnull" AS not_null,
               CASE WHEN dflt_value IS NOT NULL THEN 1 ELSE 0 END AS has_default
        FROM pragma_table_info('{table}')
    """

    def jdbc_url(self, db_params) -> str:
        return f"jdbc:sqlite:{db_params['filename']}"

    def connection_string(self, db_params, password: str) -> str:
        # reference: db_helpers/sqlite.py:50-58
        return f"{db_params['filename']}"

    def sqlalchemy_url(self, db_params, password: str) -> str:
        # reference: db_helpers/sqlite.py:60-67
        return f"sqlite:///{db_params['filename']}"
