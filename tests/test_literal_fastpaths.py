"""The round-12 one-parse driver fast paths must be RESULT-IDENTICAL
to the Column builds they replace: literal_frame's SQL-string struct
array vs the F.lit/F.struct build (schemas INCLUDING nullability, and
float values to the bit), in_values vs Column.isin (null semantics,
negation), and the similarity builders' str-SQL form vs the lambda
form. These pins are what lets the optimization claim "no query's
computed result changes" mechanically."""

from __future__ import annotations

import struct as _struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etlhelper_spark.functions.similarity import (
    nearest_pivot,
    nearest_pivot_l2,
    nearest_pivots,
)
from etlhelper_spark.functions.util import in_values, literal_frame


def _column_literal_frame(spark, rows, schema):
    """The pre-r12 Column build, kept verbatim as the reference."""
    st = (
        StructType.fromDDL(schema)
        if isinstance(schema, str)
        else schema
    )
    rows = list(rows)

    def _lit(v, dt):
        if v is None:
            return F.lit(None).cast(dt)
        if isinstance(v, (bytearray, memoryview)):
            v = bytes(v)
        elif isinstance(v, tuple):
            v = list(v)
        return F.lit(v).cast(dt)

    structs = [
        F.struct(
            *[
                _lit(v, f.dataType).alias(f.name)
                for f, v in zip(st.fields, r)
            ]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )


def _bits(row):
    return tuple(
        _struct.pack(">d", v).hex() if isinstance(v, float) else v
        for v in row
    )


LF_CASES = [
    (
        [(0, 28800, 5400, "morning"), (1, 64800, 7200, "eve'n\\i\n\x01")],
        "a int, b long, c int, d string",
    ),
    ([(bytes(range(256)), 123456789012, 7)], "sk binary, n long, k int"),
    (
        [(1, [0.1, -2.5e-300, 3.0], "x")],
        "sub int, centroid array<double>, tag string",
    ),
    ([(None, None, None)], "a int, b string, c array<double>"),
    ([(True, False, 1.5)], "p boolean, q boolean, w float"),
    ([(3, (1.0, 2.0))], "code int, vec array<double>"),
    ([(5, [])], "code int, vec array<double>"),
    ([("unicode é 漢字", -9.87654321012345e-7)], "s string, d double"),
    # non-finite floats exercise the Column-build fallback
    ([(7, float("nan")), (8, float("inf"))], "i int, d double"),
    ([(1e16, 1.7976931348623157e308, 5e-324)], "a double, b double, c double"),
]


@pytest.mark.parametrize("rows,ddl", LF_CASES)
def test_literal_frame_matches_column_build(spark, rows, ddl):
    ref = _column_literal_frame(spark, rows, ddl)
    got = literal_frame(spark, rows, ddl)
    assert got.schema == ref.schema  # includes nullability
    assert [_bits(r) for r in got.collect()] == [
        _bits(r) for r in ref.collect()
    ]


IN_CASES = [
    ("id", [1, 5, 99, 1000]),
    ("s", ["1", "it's", "a\\b", "x\ny"]),
    ("d", [0.14285714285714285, 1.0]),
    ("id", []),
    ("id", [None, 3]),
]


@pytest.mark.parametrize("col,vals", IN_CASES)
def test_in_values_matches_isin(spark, col, vals):
    df = spark.range(100).select(
        F.col("id"),
        F.col("id").cast("string").alias("s"),
        (F.col("id") / 7.0).alias("d"),
    )
    ref = df.where(F.col(col).isin(vals)).collect()
    got = df.where(in_values(col, vals)).collect()
    assert sorted(map(str, got)) == sorted(map(str, ref))


def test_in_values_negation_with_null(spark):
    df = spark.range(10)
    ref = df.where(~F.col("id").isin([None, 3])).count()
    got = df.where(~in_values("id", [None, 3])).count()
    assert got == ref  # both 0: NOT (x IN (...NULL...)) is never TRUE


def _pivot_rows():
    return [
        (0, [0.25, -1.5, 3.0000001, 0.0]),
        (3, [1e-8, 2.0, -7.25, 0.5]),
        (7, [-0.1, -0.2, -0.3, -0.4]),
    ]


def test_nearest_pivot_str_matches_column(spark):
    df = spark.range(200).select(
        F.expr(
            "transform(sequence(1, 4), j -> "
            "cast(pmod(id * j * 2654435761, 97) as double) / 97.0 - 0.5)"
        ).alias("vec")
    )
    rows = _pivot_rows()
    a = df.select(
        nearest_pivot(F.col("vec"), rows).alias("p"),
        nearest_pivots(F.col("vec"), rows, 2).alias("ps"),
        nearest_pivot_l2(F.col("vec"), rows).alias("p2"),
    ).collect()
    b = df.select(
        nearest_pivot("`vec`", rows).alias("p"),
        nearest_pivots("`vec`", rows, 2).alias("ps"),
        nearest_pivot_l2("`vec`", rows).alias("p2"),
    ).collect()
    assert [str(r) for r in a] == [str(r) for r in b]


def test_nearest_pivot_str_slice_form(spark):
    df = spark.range(50).select(
        F.expr(
            "transform(sequence(1, 8), j -> "
            "cast(pmod(id * j * 40503, 61) as double) / 61.0)"
        ).alias("vec")
    )
    rows = [(0, [0.1, 0.9, 0.4, 0.2]), (1, [0.8, 0.05, 0.6, 0.7])]
    a = df.select(
        nearest_pivot(F.slice("vec", 5, 4), rows)["pid"].alias("c")
    ).collect()
    b = df.select(
        nearest_pivot("slice(vec, 5, 4)", rows)["pid"].alias("c")
    ).collect()
    assert a == b


def test_fastpaths_under_escaped_string_literals(spark):
    """With spark.sql.parser.escapedStringLiterals=true the backslash
    escapes the SQL renders emit are taken literally — both fast paths
    must detect the legacy parser mode and fall back to the Column
    build / isin, keeping results correct (ADVICE r12 medium)."""
    rows = [(1, "a\\b"), (2, "it's\nx")]
    ddl = "i int, s string"
    vals = ["a\\b", "x\ny", "plain"]
    df = spark.createDataFrame(
        [("a\\b",), ("x\ny",), ("zzz",)], "s string"
    )
    ref_frame = [tuple(r) for r in literal_frame(spark, rows, ddl).collect()]
    ref_in = sorted(
        str(r) for r in df.where(F.col("s").isin(vals)).collect()
    )
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        got_frame = [
            tuple(r) for r in literal_frame(spark, rows, ddl).collect()
        ]
        got_in = sorted(
            str(r) for r in df.where(in_values("s", vals)).collect()
        )
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
    assert got_frame == ref_frame == [(1, "a\\b"), (2, "it's\nx")]
    assert got_in == ref_in and len(got_in) == 2


def test_in_values_dotted_column_resolves_nested_field(spark):
    """in_values must replicate F.col's multipart resolution: a dotted
    name is nested-field access, exactly like the isin fallback branch
    (ADVICE r12)."""
    df = spark.range(10).select(
        F.struct(F.col("id").alias("key")).alias("payload")
    )
    ref = sorted(
        r["payload"]["key"]
        for r in df.where(F.col("payload.key").isin([2, 5])).collect()
    )
    got = sorted(
        r["payload"]["key"]
        for r in df.where(in_values("payload.key", [2, 5])).collect()
    )
    assert got == ref == [2, 5]


def test_literal_frame_exotic_field_names_fall_back(spark):
    """Field names with backslashes or quotes must never crash the SQL
    fast path — they either render correctly or degrade to the Column
    build (ADVICE r12)."""
    for ddl_name in ("`a\\\\b`", "`it's`"):
        schema = f"{ddl_name} int, v string"
        got = literal_frame(spark, [(1, "x")], schema)
        ref = _column_literal_frame(spark, [(1, "x")], schema)
        assert got.schema == ref.schema
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in ref.collect()
        ]
