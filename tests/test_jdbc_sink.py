"""Distributed sink patterns: row validation (quarantine), merge-SQL
generation golden strings, stage_and_merge over the files backend."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from etlhelper_spark.exceptions import ETLHelperInsertError
from etlhelper_spark.operators.jdbc_sink import (
    generate_merge_sql,
    validate_rows,
)

TARGET = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("value", DoubleType(), True),
        StructField("name", StringType(), True),
    ]
)


def test_validate_rows_splits_quarantine(spark):
    df = spark.createDataFrame(
        [
            ("1", "1.5", "ok"),
            ("not_an_int", "2.5", "bad id"),
            (None, "3.5", "null id"),
            ("4", "not_a_double", "bad value"),
        ],
        ["id", "value", "name"],
    )
    valid, quarantine = validate_rows(df, TARGET)
    ok = valid.collect()
    bad = quarantine.collect()
    assert [r.id for r in ok] == [1]
    # cast failure quarantines even on nullable columns: silently
    # nulling malformed data is worse than dead-lettering it
    reasons = {r["name"]: r["__error"] for r in bad}
    assert "cannot cast id" in reasons["bad id"]
    assert "violates NOT NULL" in reasons["null id"]
    assert "cannot cast value" in reasons["bad value"]


def test_validate_rows_all_valid_passthrough(spark):
    df = spark.createDataFrame([(1, 1.0, "a")], ["id", "value", "name"])
    valid, quarantine = validate_rows(df, TARGET)
    assert valid.count() == 1
    assert quarantine.count() == 0


def test_merge_sql_postgres():
    sql = generate_merge_sql("POSTGRES", "t", ["id"], ["value", "name"])
    assert sql == (
        "INSERT INTO t (id, value, name) "
        "SELECT id, value, name FROM {staging} "
        "ON CONFLICT (id) DO UPDATE SET value = EXCLUDED.value, "
        "name = EXCLUDED.name"
    )


def test_merge_sql_oracle():
    sql = generate_merge_sql("ORACLE", "t", ["id"], ["value"])
    assert sql.startswith("MERGE INTO t t USING {staging} s ON (t.id = s.id)")
    assert "WHEN MATCHED THEN UPDATE SET t.value = s.value" in sql
    assert "WHEN NOT MATCHED THEN INSERT (id, value) VALUES (s.id, s.value)" in sql


def test_merge_sql_mssql_terminated():
    assert generate_merge_sql("MSSQL", "t", ["id"], ["v"]).endswith(";")


def test_merge_sql_requires_keys():
    with pytest.raises(ETLHelperInsertError, match="key column"):
        generate_merge_sql("POSTGRES", "t", [], ["v"])


def test_merge_sql_validates_identifiers():
    from etlhelper_spark.exceptions import ETLHelperBadIdentifierError

    with pytest.raises(ETLHelperBadIdentifierError):
        generate_merge_sql("POSTGRES", "t; DROP", ["id"], ["v"])


def test_quarantine_flow_end_to_end(spark, src_conn, dest_conn):
    """The reference's on_error pipeline, distributed: validate ->
    write valid -> quarantine rejects with reasons."""
    from etlhelper_spark import fetchall

    raw = spark.createDataFrame(
        [("0", "AFRICA2"), ("x", "BADKEY")],
        ["r_regionkey", "r_name"],
    )
    target_schema = StructType(
        [
            StructField("r_regionkey", IntegerType(), False),
            StructField("r_name", StringType(), True),
        ]
    )
    valid, quarantine = validate_rows(raw, target_schema)
    dest_conn.write_dataframe(valid, "region_checked", mode="append")
    assert len(fetchall("SELECT * FROM region_checked", dest_conn)) == 1
    assert quarantine.count() == 1
