"""SQL identifier validation.

Semantics match the reference's ``validate_identifier``
(reference: etlhelper/etl.py:642-664): PostgreSQL identifier rules
including unicode letters, an optional ``schema.`` prefix, ``$`` and
digits allowed after the first character. This is the injection guard
applied before any identifier is interpolated into SQL text that we
hand to Spark SQL or a JDBC statement.
"""

from __future__ import annotations

import re

from .exceptions import ETLHelperBadIdentifierError

# First char: letter (any unicode letter) or underscore; rest may add
# digits and $. Optionally one "schema." prefix with the same rules.
_IDENT = r"[^\W\d\$][\w\$]*"
# \Z not $: '$' would also match before a trailing newline, letting
# 'table\n' through the injection guard
_IDENTIFIER_RE = re.compile(rf"({_IDENT}\.)?{_IDENT}\Z", re.UNICODE)


def validate_identifier(identifier: str) -> None:
    """Raise ETLHelperBadIdentifierError unless *identifier* is a safe
    SQL identifier (optionally schema-qualified)."""
    if not isinstance(identifier, str) or not _IDENTIFIER_RE.fullmatch(identifier):
        raise ETLHelperBadIdentifierError(
            f"'{identifier}' contains invalid characters"
        )


# Shared SQL-text sanitizer for keyword routing decisions: neither a
# `-- returning ids` comment nor a VALUES literal containing the word
# 'insert' may change how a statement is routed.
_SQL_COMMENTS = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)
_SQL_LITERALS = re.compile(r"'(?:[^']|'')*'")


def strip_sql_noise(sql: str) -> str:
    """Return *sql* with comments removed and string literals collapsed
    to ``''``, for keyword searches that must ignore both."""
    return _SQL_LITERALS.sub("''", _SQL_COMMENTS.sub(" ", sql)).lstrip()
