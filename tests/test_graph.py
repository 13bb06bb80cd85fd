"""weighted_pagerank: hand-checked ranks, determinism, dangling nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlhelper_spark.functions.graph import weighted_pagerank


@pytest.fixture(scope="module")
def tiny_graph(spark):
    # A -> B (w2), A -> C (w1), B -> C (w1), C -> A (w1); D dangling
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
        ["src", "dst", "weight"],
    )
    return nodes, edges


def test_one_iteration_hand_computed(spark, tiny_graph):
    nodes, edges = tiny_graph
    got = {
        r["id"]: r["rank"]
        for r in weighted_pagerank(nodes, edges, iterations=1).collect()
    }
    base = (1.0 - 0.85) / 4.0
    # r0 = 0.25 each; shares: A->B 2/3, A->C 1/3, B->C 1, C->A 1
    exp = {
        0: round(base + 0.85 * 0.25, 10),                    # from C
        1: round(base + 0.85 * (0.25 * 2 / 3), 10),          # from A
        2: round(base + 0.85 * (0.25 * 1 / 3 + 0.25), 10),   # A + B
        3: round(base, 10),                                  # dangling target
    }
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9)


def test_ranks_deterministic_across_partitionings(spark, tiny_graph):
    nodes, edges = tiny_graph
    a = sorted(
        (r["id"], r["rank"])
        for r in weighted_pagerank(nodes, edges, iterations=3).collect()
    )
    b = sorted(
        (r["id"], r["rank"])
        for r in weighted_pagerank(
            nodes.repartition(7), edges.repartition(5), iterations=3
        ).collect()
    )
    assert a == b  # bit-identical, not approx: decimal-rounded per iter


def test_more_iterations_shift_mass_to_cycle(spark, tiny_graph):
    nodes, edges = tiny_graph
    got = {
        r["id"]: r["rank"]
        for r in weighted_pagerank(nodes, edges, iterations=3).collect()
    }
    # D only ever receives the base mass; cycle members exceed it
    assert got[3] == pytest.approx((1.0 - 0.85) / 4.0, abs=1e-9)
    assert all(got[i] > got[3] for i in range(3))


def test_shortest_paths_matches_bounded_bellman_ford(spark):
    """shortest_paths == a Python hop-bounded Bellman-Ford on a small
    cyclic weighted graph (incl. a strictly-cheaper long path)."""
    import random

    from etlhelper_spark.functions.graph import shortest_paths

    rng = random.Random(11)
    edges = [(i, rng.randrange(20), 1 + rng.randrange(5))
             for i in range(20) for _ in range(2)]
    # a long cheap chain that beats a short expensive hop
    edges += [(0, 10, 9), (0, 11, 1), (11, 12, 1), (12, 10, 1)]
    K = 6

    def ref():
        dist = {0: 0}
        for _ in range(K):
            nxt = dict(dist)
            for s, d, w in edges:
                if s in dist and dist[s] + w < nxt.get(d, 1 << 60):
                    nxt[d] = dist[s] + w
            dist = nxt
        return dist

    e = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in shortest_paths(e, 0, K).collect()}
    assert got == ref()
    assert got[10] == 3  # the 3-hop path, not the direct w=9 edge
    # partition invariance
    got7 = {
        r["node"]: r["dist"]
        for r in shortest_paths(e.repartition(7), 0, K).collect()
    }
    assert got7 == got


def test_shortest_paths_hop_bound_semantics(spark):
    from etlhelper_spark.functions.graph import shortest_paths

    # chain 0->1->2->3, each w=1: with max_hops=2 node 3 is unreachable
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1)], "src long, dst long, w long"
    )
    got = {r["node"]: r["dist"] for r in shortest_paths(e, 0, 2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_shortest_paths_fractional_decimal_weights_exact(spark):
    """Decimal weights with fractional parts accumulate EXACTLY — the
    r8 verdict's silent-truncation bug (cast to long floored 1.5 to 1).
    Exact expected sums hand-computed in Decimal arithmetic."""
    from decimal import Decimal

    from etlhelper_spark.functions.graph import shortest_paths

    # 0 -(1.5)-> 1 -(0.2)-> 2 ; 0 -(2.0)-> 2 direct; the 2-hop path
    # wins only if fractions are preserved (floored it would tie at 1)
    e = spark.createDataFrame(
        [
            (0, 1, Decimal("1.5")),
            (1, 2, Decimal("0.2")),
            (0, 2, Decimal("2.0")),
        ],
        "src long, dst long, w decimal(10,1)",
    )
    got = {r["node"]: r["dist"] for r in shortest_paths(e, 0, 3).collect()}
    assert got == {
        0: Decimal("0.0"),
        1: Decimal("1.5"),
        2: Decimal("1.7"),
    }
    # result type carries the weight's scale
    df = shortest_paths(e, 0, 3)
    assert df.schema["dist"].dataType.simpleString() == "decimal(38,1)"


def test_shortest_paths_rejects_float_weights(spark):
    from etlhelper_spark.functions.graph import shortest_paths

    e = spark.createDataFrame(
        [(0, 1, 1.5)], "src long, dst long, w double"
    )
    with pytest.raises(ValueError, match="integral or decimal"):
        shortest_paths(e, 0, 2)


def test_shortest_paths_rejects_decimal_scale_over_6(spark):
    """Scale > 6 silently loses the last fractional digit per hop
    under Spark's decimal-addition precision-loss rule — rejected
    loudly (ADVICE r9)."""
    from etlhelper_spark.functions.graph import shortest_paths

    e = spark.createDataFrame(
        [(0, 1, 1.5)], "src long, dst long, w double"
    ).select("src", "dst", F.col("w").cast("decimal(20,7)").alias("w"))
    with pytest.raises(ValueError, match="scale <= 6"):
        shortest_paths(e, 0, 2)
    # scale 6 is fine
    e6 = e.select("src", "dst", F.col("w").cast("decimal(20,6)").alias("w"))
    got = {r.node: r.dist for r in shortest_paths(e6, 0, 2).collect()}
    assert float(got[1]) == 1.5


def test_pagerank_releases_persisted_storage(spark, tiny_graph):
    """weighted_pagerank must not leave pinned executor storage behind
    (the embedding_covariance hygiene precedent)."""
    nodes, edges = tiny_graph
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    got = weighted_pagerank(nodes, edges, iterations=2).collect()
    assert len(got) == 4
    # localCheckpoint of the final ranks legitimately stays (it IS the
    # returned materialization and is GC-cleaned); the shares persist
    # must be gone. Allow at most the one checkpoint RDD to remain.
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1
