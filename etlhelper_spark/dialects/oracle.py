"""Oracle dialect (reference: etlhelper/db_helpers/oracle.py)."""

from __future__ import annotations

from .base import Dialect


class OracleDialect(Dialect):
    dbtype = "ORACLE"
    # reference: db_helpers/oracle.py:27
    required_params = {"host", "port", "dbname", "user"}
    paramstyle = "named"
    named_paramstyle = "named"
    positional_paramstyle = None
    jdbc_driver = "oracle.jdbc.OracleDriver"

    # reference: db_helpers/oracle.py:14-23 (all_tab_columns)
    table_info_query = """
        SELECT column_name AS name,
               data_type AS type,
               CASE nullable WHEN 'N' THEN 1 ELSE 0 END AS not_null,
               CASE WHEN data_default IS NOT NULL THEN 1 ELSE 0 END AS has_default
        FROM all_tab_columns
        WHERE table_name = UPPER('{table}')
          AND REGEXP_LIKE(owner, '{schema}')
        ORDER BY column_id
    """

    def jdbc_url(self, db_params) -> str:
        return (
            f"jdbc:oracle:thin:@//{db_params['host']}:{db_params['port']}"
            f"/{db_params['dbname']}"
        )

    def jdbc_properties(self, db_params) -> dict[str, str]:
        props = super().jdbc_properties(db_params)
        # JDBC analogue of fetch_lobs=False (reference:
        # db_helpers/oracle.py:43-48): prefetch whole LOBs inline so
        # they arrive as str/bytes without extra round-trips.
        props["oracle.jdbc.defaultLobPrefetchSize"] = "-1"
        # Map NUMBER without scale sensibly instead of DecimalType(38,10)
        props["oracle.jdbc.mapDateToTimestamp"] = "false"
        props["sessionInitStatement"] = (
            "ALTER SESSION SET NLS_TIMESTAMP_FORMAT='YYYY-MM-DD HH24:MI:SS.FF'"
        )
        return props

    def connection_string(self, db_params, password: str) -> str:
        # reference: db_helpers/oracle.py:52-61
        return (
            f"{db_params['user']}/{password}@"
            f"{db_params['host']}:{db_params['port']}/{db_params['dbname']}"
        )

    def sqlalchemy_url(self, db_params, password: str) -> str:
        # reference: db_helpers/oracle.py:63-70
        return (
            f"oracle+oracledb://{db_params['user']}:{password}@"
            f"{db_params['host']}:{db_params['port']}/?service_name={db_params['dbname']}"
        )
