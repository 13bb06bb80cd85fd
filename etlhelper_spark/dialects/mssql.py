"""MS SQL Server dialect (reference: etlhelper/db_helpers/mssql.py)."""

from __future__ import annotations

from .base import Dialect


class MSSQLDialect(Dialect):
    dbtype = "MSSQL"
    # reference: db_helpers/mssql.py:28 (odbc_driver required for the
    # native driver; irrelevant for JDBC so it moves to optional here,
    # still accepted for drop-in DbParams compatibility)
    required_params = {"host", "port", "dbname", "user"}
    optional_params = {"password_variable", "odbc_driver"}
    # pyodbc has no named paramstyle (reference: db_helpers/mssql.py:32)
    paramstyle = "qmark"
    named_paramstyle = None
    positional_paramstyle = "qmark"
    jdbc_driver = "com.microsoft.sqlserver.jdbc.SQLServerDriver"

    # reference: db_helpers/mssql.py:15-24 (INFORMATION_SCHEMA)
    table_info_query = """
        SELECT column_name AS name,
               data_type AS type,
               CASE WHEN is_nullable = 'NO' THEN 1 ELSE 0 END AS not_null,
               CASE WHEN column_default IS NOT NULL THEN 1 ELSE 0 END AS has_default
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE table_name = '{table}'
          AND table_schema LIKE '{schema}'
        ORDER BY ordinal_position
    """

    def jdbc_url(self, db_params) -> str:
        return (
            f"jdbc:sqlserver://{db_params['host']}:{db_params['port']};"
            f"databaseName={db_params['dbname']}"
        )

    def jdbc_properties(self, db_params) -> dict[str, str]:
        props = super().jdbc_properties(db_params)
        # JDBC analogue of pyodbc fast_executemany (reference:
        # db_helpers/mssql.py:43,87-96): bulk copy API for batch inserts.
        props["useBulkCopyForBatchInsert"] = "true"
        return props

    def connection_string(self, db_params, password: str) -> str:
        # reference: db_helpers/mssql.py:54-66
        driver = db_params.get("odbc_driver", "ODBC Driver 18 for SQL Server")
        return (
            f"DRIVER={driver};SERVER=tcp:{db_params['host']};PORT={db_params['port']};"
            f"DATABASE={db_params['dbname']};UID={db_params['user']};PWD={password}"
        )

    def sqlalchemy_url(self, db_params, password: str) -> str:
        # reference: db_helpers/mssql.py:68-77
        driver = db_params.get("odbc_driver", "ODBC Driver 18 for SQL Server")
        return (
            f"mssql+pyodbc://{db_params['user']}:{password}@"
            f"{db_params['host']}:{db_params['port']}/{db_params['dbname']}"
            f"?driver={driver}"
        )
