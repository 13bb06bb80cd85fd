"""etlhelper_spark — a PySpark-native ETL/analytics engine with the
capability surface of etlhelper (BritishGeologicalSurvey/etlhelper),
re-designed Spark-first for 100 TB scale.

Public API mirrors the reference's __init__ (reference:
etlhelper/__init__.py) so reference users can switch imports, plus the
Spark-native extensions (dedup, similarity search, text analysis,
multimodal, streaming) under :mod:`etlhelper_spark.functions` and
:mod:`etlhelper_spark.streaming`.
"""

from __future__ import annotations

import logging
import sys

from .abort import abort_etlhelper_threads, clear_abort_event, raise_for_abort
from .catalog import Column, table_info
from .connect import (
    SparkConnection,
    connect,
    connect_files,
    get_connection_string,
    get_sqlalchemy_connection_string,
)
from .db_params import DbParams
from .exceptions import (
    ETLHelperAbortError,
    ETLHelperBadIdentifierError,
    ETLHelperConnectionError,
    ETLHelperDbParamsError,
    ETLHelperError,
    ETLHelperExtractError,
    ETLHelperHelperError,
    ETLHelperInsertError,
    ETLHelperQueryError,
)
from .operators import (
    CHUNKSIZE,
    apply_changes,
    copy_rows,
    copy_table_rows,
    dataframe_transform,
    execute,
    executemany,
    fetchall,
    fetchone,
    generate_insert_sql,
    iter_chunks,
    iter_rows,
    load,
    stage_and_merge,
)
from .row_factories import (
    dict_row_factory,
    list_row_factory,
    namedtuple_row_factory,
    tuple_row_factory,
)
from .session import configure_session, get_session
from .types import Chunk, FailedRow, Row, Transform
from .validation import validate_identifier

__version__ = "0.1.0"

__all__ = [
    "CHUNKSIZE",
    "Chunk",
    "Column",
    "DbParams",
    "ETLHelperAbortError",
    "ETLHelperBadIdentifierError",
    "ETLHelperConnectionError",
    "ETLHelperDbParamsError",
    "ETLHelperError",
    "ETLHelperExtractError",
    "ETLHelperHelperError",
    "ETLHelperInsertError",
    "ETLHelperQueryError",
    "FailedRow",
    "Row",
    "SparkConnection",
    "Transform",
    "abort_etlhelper_threads",
    "clear_abort_event",
    "configure_session",
    "connect",
    "connect_files",
    "copy_rows",
    "copy_table_rows",
    "dataframe_transform",
    "dict_row_factory",
    "execute",
    "executemany",
    "fetchall",
    "fetchone",
    "generate_insert_sql",
    "get_connection_string",
    "get_session",
    "get_sqlalchemy_connection_string",
    "iter_chunks",
    "iter_rows",
    "list_row_factory",
    "load",
    "log_to_console",
    "namedtuple_row_factory",
    "raise_for_abort",
    "table_info",
    "tuple_row_factory",
    "validate_identifier",
]

logger = logging.getLogger("etlhelper_spark")
logger.addHandler(logging.NullHandler())


class ETLHelperFormatter(logging.Formatter):
    """DEBUG lines unprefixed, other levels prefixed
    (reference: __init__.py:66-74)."""

    def format(self, record: logging.LogRecord) -> str:
        if record.levelno == logging.DEBUG:
            self._style._fmt = "%(message)s"
        else:
            self._style._fmt = "etlhelper_spark: %(message)s"
        return super().format(record)


def log_to_console(
    level: int = logging.INFO, output=sys.stderr
) -> None:
    """Opt-in console logging (reference: __init__.py:50-81)."""
    handler = logging.StreamHandler(output)
    handler.setFormatter(ETLHelperFormatter())
    logger.addHandler(handler)
    logger.setLevel(level)
