"""literal_frame: the Catalyst-literal replacement for RDD-backed
createDataFrame on bounded hot paths — shape and type fidelity."""

import pytest

from etlhelper_spark.functions.util import literal_frame


def test_types_nulls_bytes_arrays(spark):
    df = literal_frame(
        spark,
        [
            (1, None, b"\x00\xff", [1.5, 2.5], "x"),
            (2, 7, bytes(0), [], None),
        ],
        "a long, b int, c binary, d array<double>, e string",
    )
    assert df.schema.simpleString() == (
        "struct<a:bigint,b:int,c:binary,d:array<double>,e:string>"
    )
    rows = {r["a"]: r for r in df.collect()}
    assert rows[1]["b"] is None and rows[2]["b"] == 7
    assert bytes(rows[1]["c"]) == b"\x00\xff"
    assert rows[1]["d"] == [1.5, 2.5] and rows[2]["d"] == []
    assert rows[2]["e"] is None


def test_bytearray_and_tuple_coercion(spark):
    df = literal_frame(
        spark,
        [(bytearray(b"ab"), (1.0, 2.0))],
        "c binary, d array<double>",
    )
    r = df.first()
    assert bytes(r["c"]) == b"ab" and r["d"] == [1.0, 2.0]


def test_empty_rows_keep_schema(spark):
    df = literal_frame(spark, [], "a long, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_no_python_stage_in_plan(spark):
    """The whole point: evaluating the frame must not launch a Python
    worker (createDataFrame's RDD shape does)."""
    df = literal_frame(spark, [(1, "x"), (2, "y")], "a long, b string")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Python" not in plan
    assert "Scan ExistingRDD" not in plan
