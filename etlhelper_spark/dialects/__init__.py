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

__all__ = [
    "Dialect",
    "DIALECT_REGISTRY",
    "PostgresDialect",
    "OracleDialect",
    "MSSQLDialect",
    "SQLiteDialect",
]
