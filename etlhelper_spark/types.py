"""Type aliases (reference: etlhelper/types.py)."""

from __future__ import annotations

from typing import Any, Callable, Mapping, NamedTuple, Sequence, TypeAlias

Row: TypeAlias = Any
InputRow: TypeAlias = Mapping[str, Any] | Sequence[Any]
Chunk: TypeAlias = list[Row]
#: chunk -> chunk transform; may change row count and shape
#: (reference: types.py:23)
Transform: TypeAlias = Callable[[Chunk], Chunk]


class FailedRow(NamedTuple):
    """A rejected row paired with the exception that rejected it
    (reference: etl.py:48-50)."""

    row: Row
    exception: Exception
