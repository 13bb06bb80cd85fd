"""Abort semantics (reference: test/integration/etl/test_abort.py),
logging contract (test_etl_logging.py), table_info
(test/integration/test_utils.py)."""

import logging
import threading
import time

import pytest

from etlhelper_spark import (
    Column,
    ETLHelperAbortError,
    ETLHelperQueryError,
    abort_etlhelper_threads,
    fetchall,
    fetchone,
    iter_chunks,
    table_info,
)


def test_abort_mid_extract_and_recovery(src_conn):
    def aborter():
        time.sleep(0.3)
        abort_etlhelper_threads()

    t = threading.Thread(target=aborter)
    t.start()
    with pytest.raises(ETLHelperAbortError):
        for _ in iter_chunks(
            "SELECT a.l_orderkey FROM lineitem a CROSS JOIN lineitem b",
            src_conn,
            chunk_size=500,
        ):
            time.sleep(0.1)
    t.join()
    # event auto-clears on the next ETL call (reference: etl.py:88)
    assert fetchone("SELECT 1 AS one FROM region", src_conn) == {"one": 1}


def test_logging_contract(src_conn, caplog):
    logger = logging.getLogger("etlhelper_spark")
    with caplog.at_level(logging.INFO, logger="etlhelper_spark"):
        fetchall("SELECT * FROM region", src_conn)
    messages = [r.getMessage() for r in caplog.records]
    assert any(m.startswith("Fetching rows (chunk_size=") for m in messages)
    assert any(m.endswith("rows returned") for m in messages)


def test_table_info_files_backend(src_conn):
    cols = table_info("region", src_conn)
    assert cols == [
        Column("r_regionkey", "int", False, False),
        Column("r_name", "string", False, False),
    ]


def test_table_info_missing_table(src_conn):
    with pytest.raises(ETLHelperQueryError, match="not found"):
        table_info("no_such_table", src_conn)
