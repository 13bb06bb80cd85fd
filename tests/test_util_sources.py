"""salted_join equivalence, ensure_parallelism, CSV/JSON backends."""

import tempfile

from pyspark.sql import functions as F

from etlhelper_spark import connect_files, copy_table_rows, fetchall
from etlhelper_spark.functions.util import ensure_parallelism, salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark, src_conn):
    o = src_conn.table_dataframe("orders")
    c = src_conn.table_dataframe("customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey", salt=8).groupBy(
        "c_mktsegment"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_row_count(spark, src_conn):
    o = src_conn.table_dataframe("orders")
    c = src_conn.table_dataframe("customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    assert salted_join(o, c, "o_custkey").count() == o.join(c, "o_custkey").count()


def test_ensure_parallelism_noop_when_enough(spark):
    df = spark.range(1000).repartition(64)
    assert ensure_parallelism(df).rdd.getNumPartitions() == 64


def test_ensure_parallelism_expands_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    out = ensure_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_csv_backend_roundtrip(spark, src_conn):
    d = tempfile.mkdtemp(prefix="ehs_csv_")
    dest = connect_files(d, file_format="csv", spark=spark)
    copy_table_rows("region", src_conn, dest)
    rows = fetchall("SELECT * FROM region ORDER BY r_regionkey", dest)
    assert len(rows) == 5
    assert rows[0]["r_name"] == "AFRICA"


def test_json_backend_roundtrip(spark, src_conn):
    d = tempfile.mkdtemp(prefix="ehs_json_")
    dest = connect_files(d, file_format="json", spark=spark)
    copy_table_rows("nation", src_conn, dest)
    rows = fetchall("SELECT count(*) AS n FROM nation", dest)
    assert rows[0]["n"] == 25
