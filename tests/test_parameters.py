"""Bind-parameter rendering: all five PEP-249 paramstyles
(reference: etl.py:596-602; both styles tested at
test/integration/etl/test_etl_extract.py:72-87)."""

import datetime as dt

import pytest

from etlhelper_spark.exceptions import ETLHelperQueryError
from etlhelper_spark.parameters import bind_parameters, render_literal


def test_qmark():
    assert (
        bind_parameters("SELECT * FROM t WHERE a = ? AND b = ?", (1, "x"))
        == "SELECT * FROM t WHERE a = 1 AND b = 'x'"
    )


def test_numeric():
    assert (
        bind_parameters("SELECT * FROM t WHERE a = :1 AND b = :2", (1, "x"))
        == "SELECT * FROM t WHERE a = 1 AND b = 'x'"
    )


def test_named():
    assert (
        bind_parameters("WHERE a = :a AND b = :b", {"a": 1, "b": "x"})
        == "WHERE a = 1 AND b = 'x'"
    )


def test_format():
    assert bind_parameters("WHERE a = %s", (1.5,)) == "WHERE a = 1.5"


def test_pyformat():
    assert (
        bind_parameters("WHERE a = %(a)s", {"a": None}) == "WHERE a = NULL"
    )


def test_string_escaping_blocks_injection():
    sql = bind_parameters("WHERE name = ?", ("O'Brien'; DROP TABLE x--",))
    assert sql == "WHERE name = 'O''Brien''; DROP TABLE x--'"


def test_placeholder_inside_string_literal_untouched():
    sql = bind_parameters("WHERE a = 'lit?eral' AND b = ?", (5,))
    assert sql == "WHERE a = 'lit?eral' AND b = 5"


def test_missing_named_param_raises():
    with pytest.raises(ETLHelperQueryError, match="not supplied"):
        bind_parameters("WHERE a = :a", {"b": 1})


def test_too_few_positional_raises():
    with pytest.raises(ETLHelperQueryError):
        bind_parameters("WHERE a = ? AND b = ?", (1,))


def test_no_params_passthrough():
    assert bind_parameters("SELECT 1", ()) == "SELECT 1"


@pytest.mark.parametrize(
    "value,expected",
    [
        (None, "NULL"),
        (True, "TRUE"),
        (42, "42"),
        (1.5, "1.5"),
        ("it's", "'it''s'"),
        (dt.date(2024, 1, 2), "DATE '2024-01-02'"),
        (
            dt.datetime(2024, 1, 2, 3, 4, 5),
            "TIMESTAMP '2024-01-02 03:04:05.000000'",
        ),
        (b"\x01\xff", "X'01ff'"),
        ([1, 2], "(1, 2)"),
    ],
)
def test_render_literal(value, expected):
    assert render_literal(value) == expected


def test_double_colon_cast_not_a_placeholder():
    """x::int is the SQL cast operator (Spark 4 supports it) — the
    named-style regex must not read ':int' as a bind parameter."""
    assert (
        bind_parameters("SELECT x::int FROM t WHERE a = :a", {"a": 5})
        == "SELECT x::int FROM t WHERE a = 5"
    )
    # placeholder immediately followed by a cast
    assert (
        bind_parameters("SELECT :x::int AS v", {"x": 2})
        == "SELECT 2::int AS v"
    )
    # numeric style too
    assert (
        bind_parameters("SELECT x::1 FROM t WHERE a = :1", (7,))
        == "SELECT x::1 FROM t WHERE a = 7"
    )


@pytest.mark.parametrize("bad", [float("inf"), float("-inf"), float("nan")])
def test_non_finite_float_rejected(bad):
    with pytest.raises(ETLHelperQueryError):
        render_literal(bad)


def test_aware_datetime_keeps_offset():
    aware = dt.datetime(
        2024, 1, 1, 10, 30, 0, 123456,
        tzinfo=dt.timezone(dt.timedelta(hours=2)),
    )
    assert (
        render_literal(aware)
        == "TIMESTAMP '2024-01-01 10:30:00.123456+02:00'"
    )
