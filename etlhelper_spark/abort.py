"""Cooperative cross-thread cancellation.

Preserves the reference's semantics (reference: etlhelper/abort.py:8-28):
an event that another thread may set; running ETL operations check it at
chunk granularity and raise ETLHelperAbortError; the event is cleared at
the start of each new ETL call. On top of that, setting the event also
cancels the Spark job group so executor-side work stops promptly rather
than only at the next driver-side chunk boundary.
"""

from __future__ import annotations

import threading

from .exceptions import ETLHelperAbortError

abort_event = threading.Event()

_active_spark = None  # most recent session an ETL op ran on
_group_counter = 0
_current_group = "etlhelper_spark_0"
_lock = threading.Lock()


def _register_session(spark) -> None:
    """Start a fresh job group for this ETL call. A unique group id per
    call means cancelling one run can never poison the next (Spark may
    keep rejecting jobs submitted under an already-cancelled group)."""
    global _active_spark, _group_counter, _current_group
    with _lock:
        _group_counter += 1
        _current_group = f"etlhelper_spark_{_group_counter}"
        _active_spark = spark
    try:
        spark.sparkContext.setJobGroup(_current_group, "etlhelper_spark ETL", True)
    except Exception:
        pass


def abort_etlhelper_threads() -> None:
    """Set the abort event and cancel in-flight Spark jobs
    (reference: abort.py:8-14)."""
    abort_event.set()
    if _active_spark is not None:
        try:
            _active_spark.sparkContext.cancelJobGroup(_current_group)
        except Exception:
            pass


def clear_abort_event() -> None:
    """Reset the abort state for the next ETL run (reference: abort.py:17-19)."""
    abort_event.clear()


def raise_for_abort(message: str = "ETL process aborted by abort_etlhelper_threads()") -> None:
    """Raise ETLHelperAbortError if the abort event is set
    (reference: abort.py:22-28)."""
    if abort_event.is_set():
        raise ETLHelperAbortError(message)
