"""Dialect base class (reference: etlhelper/db_helpers/db_helper.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..db_params import DbParams


class Dialect:
    """Per-database rendering rules for the Spark JDBC source/sink."""

    dbtype: str = ""
    required_params: set[str] = set()
    optional_params: set[str] = {"password_variable"}
    #: DB-API paramstyle for positional parameters (reference helpers
    #: expose paramstyle / named_paramstyle / positional_paramstyle)
    paramstyle: str = "format"
    named_paramstyle: str | None = None
    positional_paramstyle: str | None = None
    jdbc_driver: str = ""
    #: file-backed engines (SQLite, Derby embedded) take no credentials
    #: and have no host to probe
    passwordless: bool = False
    #: catalog query template for table_info; {table}/{schema} filled in
    table_info_query: str = ""

    def jdbc_url(self, db_params: "DbParams") -> str:
        raise NotImplementedError

    def jdbc_properties(self, db_params: "DbParams") -> dict[str, str]:
        """Per-driver performance options (batch rewrite, fetch tuning)."""
        props = {"driver": self.jdbc_driver} if self.jdbc_driver else {}
        return props

    def connection_string(self, db_params: "DbParams", password: str) -> str:
        raise NotImplementedError

    def sqlalchemy_url(self, db_params: "DbParams", password: str) -> str:
        raise NotImplementedError
