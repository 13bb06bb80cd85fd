"""Dialect registry: dbtype -> JDBC URL/properties/catalog-SQL rules.

Plays the role of the reference's DB_HELPER_FACTORY
(reference: etlhelper/db_helper_factory.py:22-84) but targets Spark's
JDBC data source instead of DB-API drivers. Each dialect knows:

- required/optional DbParams keys (reference validation sets)
- how to render the JDBC URL and per-driver performance options
- the catalog query behind ``table_info``
- the DB-API paramstyles it accepts at the API boundary
"""

from __future__ import annotations

from .base import Dialect
from .derby import DerbyDialect
from .mssql import MSSQLDialect
from .oracle import OracleDialect
from .postgres import PostgresDialect
from .sqlite import SQLiteDialect

DIALECT_REGISTRY: dict[str, Dialect] = {
    "POSTGRES": PostgresDialect(),
    "PG": PostgresDialect(),
    "ORACLE": OracleDialect(),
    "MSSQL": MSSQLDialect(),
    "SQLITE": SQLiteDialect(),
    "DERBY": DerbyDialect(),
}

# str(conn.__class__) -> dbtype, mirroring the reference's
# DB_HELPER_FACTORY.from_conn dispatch (db_helper_factory.py:46-60) so
# code migrating from the reference that passes raw DB-API connection
# objects still resolves the right dialect.
_CONN_CLASS_REGISTRY: dict[str, str] = {
    "<class 'oracledb.Connection'>": "ORACLE",
    "<class 'psycopg2.extensions.connection'>": "PG",
    "<class 'pyodbc.Connection'>": "MSSQL",
    "<class 'sqlite3.Connection'>": "SQLITE",
}


def from_dbtype(dbtype: str) -> Dialect:
    """Dialect for a DbParams.dbtype (reference: from_dbtype,
    db_helper_factory.py:63-72)."""
    from ..exceptions import ETLHelperHelperError

    try:
        return DIALECT_REGISTRY[dbtype.upper()]
    except KeyError:
        raise ETLHelperHelperError(f"Unsupported DbParams.dbtype: {dbtype}")


def from_conn(conn) -> Dialect:
    """Dialect for a raw DB-API connection object (reference:
    from_conn, db_helper_factory.py:46-60): dispatch keys on
    ``str(conn.__class__)`` exactly as the reference does, so the
    same driver connections resolve to the same dialect."""
    from ..exceptions import ETLHelperHelperError

    if not hasattr(conn, "cursor"):
        raise ETLHelperHelperError(
            f"Expected connection-like object, got {type(conn)}"
        )
    conn_type = str(conn.__class__)
    try:
        return from_dbtype(_CONN_CLASS_REGISTRY[conn_type])
    except KeyError:
        raise ETLHelperHelperError(
            f"Unsupported connection type: {conn_type}"
        )


__all__ = [
    "Dialect",
    "DIALECT_REGISTRY",
    "from_conn",
    "from_dbtype",
    "PostgresDialect",
    "OracleDialect",
    "MSSQLDialect",
    "SQLiteDialect",
    "DerbyDialect",
]
