"""PostgreSQL dialect (reference: etlhelper/db_helpers/postgres.py)."""

from __future__ import annotations

from .base import Dialect


class PostgresDialect(Dialect):
    dbtype = "POSTGRES"
    # reference: db_helpers/postgres.py:37
    required_params = {"host", "port", "dbname", "user"}
    paramstyle = "pyformat"
    named_paramstyle = "pyformat"
    positional_paramstyle = "format"
    jdbc_driver = "org.postgresql.Driver"

    # reference: db_helpers/postgres.py:14-33 (pg_catalog query)
    table_info_query = """
        SELECT
            pg_attribute.attname AS name,
            pg_catalog.format_type(pg_attribute.atttypid, pg_attribute.atttypmod) AS type,
            pg_attribute.attnotnull AS not_null,
            pg_attribute.atthasdef AS has_default
        FROM pg_catalog.pg_attribute
        INNER JOIN pg_catalog.pg_class ON pg_class.oid = pg_attribute.attrelid
        INNER JOIN pg_catalog.pg_namespace ON pg_namespace.oid = pg_class.relnamespace
        WHERE pg_attribute.attnum > 0
          AND NOT pg_attribute.attisdropped
          AND pg_class.relname = '{table}'
          AND pg_namespace.nspname ~ '{schema}'
        ORDER BY pg_attribute.attnum
    """

    def jdbc_url(self, db_params) -> str:
        return (
            f"jdbc:postgresql://{db_params['host']}:{db_params['port']}"
            f"/{db_params['dbname']}"
        )

    def jdbc_properties(self, db_params) -> dict[str, str]:
        props = super().jdbc_properties(db_params)
        # The JDBC analogue of psycopg2's execute_batch fast path
        # (reference: db_helpers/postgres.py:85-96): rewrite multi-row
        # INSERTs into one statement per batch round-trip.
        props["reWriteBatchedInserts"] = "true"
        return props

    def connection_string(self, db_params, password: str) -> str:
        # reference: db_helpers/postgres.py:55-64
        return (
            f"host={db_params['host']} port={db_params['port']} "
            f"dbname={db_params['dbname']} "
            f"user={db_params['user']} password={password}"
        )

    def sqlalchemy_url(self, db_params, password: str) -> str:
        # reference: db_helpers/postgres.py:66-74
        return (
            f"postgresql://{db_params['user']}:{password}@"
            f"{db_params['host']}:{db_params['port']}/{db_params['dbname']}"
        )
