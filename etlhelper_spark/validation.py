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


def strip_sql_noise(sql: str) -> str:
    """Return *sql* with comments removed, string literals collapsed to
    ``''`` and quoted identifiers to ``""``, for keyword searches that
    must ignore all three.

    Single left-to-right scan, NOT regex passes: ordered regexes get
    either nesting wrong — a literal containing ``--`` (``'a--b'``)
    must not start a comment, and a comment containing a quote
    (``-- don't``) must not open a literal. The scanner tracks which
    construct opened first, the only correct rule.
    """
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # string literal; '' is the escaped quote
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append("''")
            i = j + 1
        elif ch == '"':  # quoted identifier (may contain keywords)
            j = sql.find('"', i + 1)
            out.append('""')
            i = n if j == -1 else j + 1
        elif ch == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            out.append(" ")
            i = n if j == -1 else j  # keep the newline itself
        elif ch == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            out.append(" ")
            i = n if j == -1 else j + 2
        else:
            out.append(ch)
            i += 1
    return "".join(out).lstrip()
