"""Embedding clustering: distributed Lloyd iterations (k-means) for
semantic curation — diversity sampling, cluster-balanced mixtures,
semantic dedup all start from "group the corpus by embedding".

Spark-first shape per iteration:

- ASSIGN: the k centroids are a k-row broadcast; every vector ranks
  them (cosine desc, centroid id asc — a total order, so assignment
  is deterministic) and keeps the top one. No shuffle of the corpus.
- RECOMPUTE: element-wise centroid mean via posexplode → (cluster,
  pos) average → re-assemble, i.e. one combinable aggregate over
  |corpus| × dim value rows, then a k×dim result — tiny.

Every centroid component is rounded through DECIMAL(30,10) to 6
decimals after each recompute: cross-engine float discipline (both
engines then rank IDENTICAL doubles, so assignments match exactly —
the same _sround contract the query corpus uses everywhere), and at
scale the rounding is free.

Iteration count is a fixed parameter (the standard bounded-iteration
contract for distributed k-means; convergence-based stopping adds a
driver round-trip per iteration and is rarely worth it on huge
corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import cosine_similarity

__all__ = ["kmeans_assignments"]


def _round6(col):
    return F.round(col.cast("decimal(30,10)"), 6).cast("double")


def kmeans_assignments(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Assign every vector to a cluster after *iterations* Lloyd
    rounds from deterministic seeds (the k lowest-id vectors).

    Returns (id, cluster_id, sim) where sim is the cosine to the final
    centroid the row is assigned to."""
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    centroids = (
        vecs.orderBy(F.col("id").asc())
        .limit(k)
        .select(
            F.col("id").alias("cluster_id"),
            F.transform("vec", lambda x: _round6(x)).alias("centroid"),
        )
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = vecs.join(F.broadcast(cents)).select(
            "id",
            "vec",
            "cluster_id",
            cosine_similarity(F.col("vec"), F.col("centroid")).alias("sim"),
        )
        w = Window.partitionBy("id").orderBy(
            F.desc("sim"), F.asc("cluster_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    for _ in range(iterations - 1):
        assigned = assign(centroids)
        centroids = (
            assigned.select(
                "cluster_id", F.posexplode("vec").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(_round6(F.avg("val")).alias("cv"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "cv"))
                    ),
                    lambda s: s["cv"],
                ).alias("centroid")
            )
        )
    return assign(centroids).select("id", "cluster_id", "sim")
