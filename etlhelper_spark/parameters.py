"""Client-side bind-parameter substitution.

The reference passes ``parameters`` straight to the DB-API driver and
supports all five PEP-249 paramstyles (reference: etlhelper/etl.py:56,95
and the placeholder table at etl.py:596-602). Spark SQL strings have no
driver-side binding, so we render parameters as *typed SQL literals*
client-side. Identifier injection is impossible because values are
rendered as literals only (strings escaped, no identifier substitution).

Supported styles, auto-detected from the SQL text and parameter type:

- ``qmark``      ``WHERE a = ?``            with sequence params
- ``numeric``    ``WHERE a = :1``           with sequence params
- ``format``     ``WHERE a = %s``           with sequence params
- ``named``      ``WHERE a = :name``        with mapping params
- ``pyformat``   ``WHERE a = %(name)s``     with mapping params
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal
from typing import Any, Mapping, Sequence

from .exceptions import ETLHelperQueryError

_QMARK = re.compile(r"\?")
# negative lookbehind: a ":" directly after another ":" is the SQL
# cast operator (x::int, supported by Spark 4), not a placeholder
_NUMERIC = re.compile(r"(?<!:):(\d+)")
_NAMED = re.compile(r"(?<!:):([A-Za-z_][A-Za-z0-9_]*)")
_FORMAT = re.compile(r"%s")
_PYFORMAT = re.compile(r"%\(([A-Za-z_][A-Za-z0-9_]*)\)s")
# a string literal or quoted identifier — placeholders inside these
# must not be substituted
_TOKEN = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")


def render_literal(value: Any) -> str:
    """Render a Python value as a SQL literal."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        if value != value or value in (float("inf"), float("-inf")):
            # repr() would emit inf/nan — not valid SQL literals
            raise ETLHelperQueryError(
                f"Cannot render non-finite float {value!r} as a SQL literal"
            )
        return repr(value)
    if isinstance(value, (int, Decimal)):
        return repr(value) if not isinstance(value, Decimal) else str(value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            # keep the offset — silently dropping it would shift the
            # instant for any non-UTC aware datetime
            return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (bytes, bytearray)):
        return "X'" + value.hex() + "'"
    if isinstance(value, str):
        if "\x00" in value:
            # NUL cannot be represented inside a SQL string literal
            # (engines either reject or truncate at it — both unsafe)
            raise ETLHelperQueryError(
                "String bind parameter contains a NUL (\\x00) character, "
                "which cannot be rendered as a SQL literal"
            )
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, (list, tuple)):
        return "(" + ", ".join(render_literal(v) for v in value) + ")"
    raise ETLHelperQueryError(f"Cannot render SQL literal for {type(value)!r}")


def _sub_outside_strings(sql: str, pattern: re.Pattern, repl) -> str:
    """Apply regex substitution only outside quoted strings/identifiers."""
    out: list[str] = []
    pos = 0
    for m in _TOKEN.finditer(sql):
        out.append(pattern.sub(repl, sql[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(pattern.sub(repl, sql[pos:]))
    return "".join(out)


def to_qmark(sql: str) -> tuple[str, list[str] | None]:
    """Convert any PEP-249 placeholder style to JDBC ``?`` markers.

    Returns (converted_sql, param_names) where param_names is the
    ordered list of names for named styles (to pull values from
    mapping rows) or None for positional styles.
    """
    names: list[str] = []

    def collect(m: re.Match) -> str:
        names.append(m.group(1))
        return "?"

    out = _sub_outside_strings(sql, _PYFORMAT, collect)
    if names:
        return out, names
    out = _sub_outside_strings(sql, _NAMED, collect)
    if names:
        return out, names
    out = _sub_outside_strings(sql, _NUMERIC, lambda m: "?")
    if out != sql:
        return out, None
    out = _sub_outside_strings(sql, _FORMAT, lambda m: "?")
    return out, None


def bind_parameters(
    sql: str, parameters: Sequence[Any] | Mapping[str, Any] = ()
) -> str:
    """Substitute *parameters* into *sql* as typed literals.

    Accepts tuples/lists for positional styles (qmark/numeric/format)
    and mappings for named styles (named/pyformat), mirroring the
    reference's dual parameter interface (reference: etl.py:56,95).
    """
    if parameters is None or (
        not isinstance(parameters, Mapping) and len(parameters) == 0
    ):
        return sql

    if isinstance(parameters, Mapping):
        def named_repl(m: re.Match) -> str:
            name = m.group(1)
            if name not in parameters:
                raise ETLHelperQueryError(
                    f"Bind parameter '{name}' not supplied (have "
                    f"{sorted(parameters)})"
                )
            return render_literal(parameters[name])

        sql2 = _sub_outside_strings(sql, _PYFORMAT, named_repl)
        # avoid rewriting cast operators etc. — named style last
        sql2 = _sub_outside_strings(sql2, _NAMED, named_repl)
        return sql2

    params = list(parameters)

    def numeric_repl(m: re.Match) -> str:
        idx = int(m.group(1)) - 1
        if idx < 0 or idx >= len(params):
            raise ETLHelperQueryError(f"Bind index :{m.group(1)} out of range")
        return render_literal(params[idx])

    if _sub_outside_strings(sql, _NUMERIC, lambda m: "\0") != sql:
        return _sub_outside_strings(sql, _NUMERIC, numeric_repl)

    it = iter(params)

    def seq_repl(m: re.Match) -> str:
        try:
            return render_literal(next(it))
        except StopIteration:
            raise ETLHelperQueryError(
                "More placeholders than supplied parameters"
            ) from None

    if _sub_outside_strings(sql, _QMARK, lambda m: "\0") != sql:
        return _sub_outside_strings(sql, _QMARK, seq_repl)
    return _sub_outside_strings(sql, _FORMAT, seq_repl)
