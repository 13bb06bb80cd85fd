"""Row factories: control the shape rows take on the driver side.

Same four shapes as the reference (reference:
etlhelper/row_factories.py:16-94), selected via ``row_factory=`` on the
extract operators. In the reference a factory is built from a DB-API
cursor; here it is built from a list of column names (a DataFrame
schema) and maps ``pyspark.sql.Row`` -> caller-facing shape.
"""

from __future__ import annotations

import warnings
from collections import namedtuple
from typing import Any, Callable, Sequence

RowMapper = Callable[[Any], Any]


def dict_row_factory(columns: Sequence[str]) -> RowMapper:
    """Mutable dict keyed by column name (the default; reference:
    row_factories.py:44-61)."""
    cols = list(columns)

    def create_row(row: Sequence[Any]) -> dict[str, Any]:
        return dict(zip(cols, row))

    return create_row


def namedtuple_row_factory(columns: Sequence[str]) -> RowMapper:
    """Immutable namedtuple rows. Invalid field names (e.g. ``count(*)``,
    names with spaces) are renamed to positional ``_N`` with a warning,
    matching the reference (reference: row_factories.py:29-36)."""
    cols = list(columns)
    try:
        Row = namedtuple("Row", cols)  # type: ignore[misc]
    except ValueError:
        Row = namedtuple("Row", cols, rename=True)  # type: ignore[misc]
        renamed = [
            f"{old} was renamed to {new}"
            for old, new in zip(cols, Row._fields)
            if old != new
        ]
        warnings.warn(
            "One or more columns have been renamed: " + "; ".join(renamed)
        )

    def create_row(row: Sequence[Any]) -> tuple:
        return Row(*row)

    return create_row


def tuple_row_factory(columns: Sequence[str]) -> RowMapper:
    """Plain tuple passthrough — the zero-overhead option (reference:
    row_factories.py:64-79)."""

    def create_row(row: Sequence[Any]) -> tuple:
        return tuple(row)

    return create_row


def list_row_factory(columns: Sequence[str]) -> RowMapper:
    """Mutable list rows (reference: row_factories.py:82-94)."""

    def create_row(row: Sequence[Any]) -> list:
        return list(row)

    return create_row
