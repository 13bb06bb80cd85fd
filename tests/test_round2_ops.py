"""IVF ANN recall, streaming dedup, distributed copy on_error."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ivf_structure_and_recall_floor(spark):
    from etlhelper_spark.functions.similarity import brute_force_topk, ivf_topk
    from etlhelper_spark.sources import read_parquet_table

    vecs = read_parquet_table(spark, f"{SF}/embeddings.parquet").cache()
    queries = vecs.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, vecs, k=5)
    approx = ivf_topk(queries, vecs, k=5, nlist=10, nprobe=5)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    rows = approx.collect()
    approx_set = {(r.query_id, r.neighbor_id) for r in rows}
    # testdata embeddings are near-uniform random (no geometric
    # clusters), so expected recall ≈ nprobe/nlist = 0.5; assert a
    # loose floor plus structural invariants
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.25, f"recall {recall}"
    assert all(1 <= r.rank <= 5 for r in rows)
    assert all(r.query_id != r.neighbor_id for r in rows)


def test_ivf_finds_identical_vector(spark):
    from etlhelper_spark.functions.similarity import ivf_topk
    from etlhelper_spark.sources import read_parquet_table

    vecs = read_parquet_table(spark, f"{SF}/embeddings.parquet")
    doubled = vecs.select("vec_id", "embedding").unionAll(
        vecs.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    )
    res = ivf_topk(
        doubled.where(F.col("vec_id") < 3), doubled, k=1, nprobe=1
    ).collect()
    # an identical vector co-assigns to the same inverted list and is
    # always found even at nprobe=1
    for r in res:
        assert r.neighbor_id == r.query_id + 10_000
        assert r.sim == 1.0


def test_streaming_dedup(spark, tmp_path):
    from etlhelper_spark.streaming.windows import streaming_dedup_events

    out = streaming_dedup_events(spark, SF, str(tmp_path / "ck"))
    batch = spark.read.parquet(f"{SF}/events.parquet")
    # source has unique event_ids: dedup keeps everything
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == out.count()


def test_copy_rows_on_error_quarantines(spark, src_conn, dest_conn):
    from etlhelper_spark import copy_rows, fetchall, load

    # seed dest with a strict-schema table (int key)
    load("sink", dest_conn, [{"k": 1, "v": "seed"}])
    errors = []
    # copy rows whose k is a string that can't cast to the sink's long
    processed, failed = copy_rows(
        "SELECT concat('x', CAST(n_nationkey AS STRING)) AS k, n_name AS v "
        "FROM nation WHERE n_nationkey < 3",
        src_conn,
        "INSERT INTO sink (k, v) VALUES",
        dest_conn,
        on_error=errors.extend,
    )
    assert processed == 3
    assert failed == 3
    assert len(errors) == 3
    assert all("cannot cast" in str(e.exception) for e in errors)
    # nothing bad written
    assert len(fetchall("SELECT * FROM sink", dest_conn)) == 1


def test_stage_cache_bounded_eviction(spark):
    """The pair/cluster stage caches must evict (and unpersist) oldest
    entries beyond the cap — a long session over many sf_dirs must not
    pin checkpointed blocks forever."""
    from etlhelper_spark.plans.queries import _STAGE_CACHE_MAX, _cache_put

    cache = {}
    dfs = [spark.range(i + 1) for i in range(_STAGE_CACHE_MAX + 2)]
    for i, df in enumerate(dfs):
        _cache_put(cache, ("app", f"sf{i}"), df)
    assert len(cache) == _STAGE_CACHE_MAX
    # oldest two evicted, newest retained
    assert ("app", "sf0") not in cache and ("app", "sf1") not in cache
    assert ("app", f"sf{_STAGE_CACHE_MAX + 1}") in cache
