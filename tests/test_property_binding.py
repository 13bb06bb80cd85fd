"""Property-based fuzz of the literal-rendering layer (hypothesis):
whatever value goes in, the rendered SQL literal must evaluate back to
exactly that value in a real SQL engine (DuckDB here — the same class
of parser Spark SQL uses), and string rendering must never break out
of the literal (injection-proof by construction)."""

import datetime as dt
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etlhelper_spark.parameters import bind_parameters, render_literal

con = duckdb.connect()


def roundtrip(value):
    return con.sql(f"SELECT {render_literal(value)} AS v").fetchone()[0]


@given(st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_int_roundtrip(x):
    assert roundtrip(x) == x


@given(
    st.floats(allow_nan=False, allow_infinity=False, width=64)
)
@settings(max_examples=200, deadline=None)
def test_float_roundtrip(x):
    got = roundtrip(x)
    assert got == x or (math.isclose(got, x, rel_tol=0, abs_tol=0))


@given(st.text(max_size=200).filter(lambda s: "\x00" not in s))
@settings(max_examples=300, deadline=None)
def test_text_roundtrip_never_escapes_literal(s):
    # any text — quotes, newlines, unicode, SQL fragments — must come
    # back byte-identical, proving it stayed inside the literal
    assert roundtrip(s) == s


def test_nul_in_string_rejected():
    from etlhelper_spark.exceptions import ETLHelperQueryError

    with pytest.raises(ETLHelperQueryError, match="NUL"):
        render_literal("a\x00b")


@given(st.text(max_size=50).filter(lambda s: "\x00" not in s))
@settings(max_examples=200, deadline=None)
def test_bound_predicate_is_single_statement(s):
    sql = bind_parameters("SELECT count(*) AS n FROM t WHERE c = ?", (s,))
    # the statement must still be exactly one statement with one
    # string literal — a successful injection would add clauses
    assert sql.count("SELECT") == 1
    assert ";" not in sql.replace(s.replace("'", "''"), "")


@given(
    st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31))
)
@settings(max_examples=100, deadline=None)
def test_date_roundtrip(d):
    assert roundtrip(d) == d


@given(
    st.datetimes(
        min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 31)
    )
)
@settings(max_examples=100, deadline=None)
def test_datetime_roundtrip(ts):
    assert roundtrip(ts) == ts


def test_bytes_roundtrip_spark(spark):
    # binary literals target Spark SQL (X'…'), not DuckDB's blob
    # syntax — round-trip through the real consumer
    for b in (b"\x00", b"\x01\xff\x7f", bytes(range(64)), b"ab'cd"):
        got = spark.sql(f"SELECT {render_literal(b)} AS v").first()["v"]
        assert bytes(got) == b
