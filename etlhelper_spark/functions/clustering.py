"""Embedding clustering: distributed Lloyd iterations (k-means) for
semantic curation — diversity sampling, cluster-balanced mixtures,
semantic dedup all start from "group the corpus by embedding".

Spark-first shape per iteration:

- ASSIGN: the k centroids are bounded, so they are collected and
  embedded as a LITERAL array; every vector computes its argmax
  (cosine desc, centroid id asc — a total order, so assignment is
  deterministic) as a codegen fold. ZERO shuffle and zero expansion
  of the corpus — the earlier broadcast-join + Window(row_number)
  form expanded every row k× and shuffled the expanded set per
  iteration, an avoidable k×-corpus shuffle at 100 TB.
- RECOMPUTE: element-wise centroid mean via posexplode → (cluster,
  pos) average → re-assemble, i.e. one combinable aggregate over
  |corpus| × dim value rows, then a k×dim result — tiny. Collecting
  that k×dim result to the driver per round (to build the next
  literal) is the same bounded-driver move the IVF probe list makes.

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

from .similarity import collect_pivot_rows, nearest_pivot

__all__ = ["kmeans_assignments"]


def _round6(col):
    return F.round(col.cast("decimal(30,10)"), 6).cast("double")


def kmeans_assignments(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    literal_max: int = 64,
) -> DataFrame:
    """Assign every vector to a cluster after *iterations* Lloyd
    rounds from deterministic seeds (the k lowest-id vectors).

    Up to *literal_max* centroids the assignment is the shuffle-free
    literal-pivot codegen argmax; past it (k derived from corpus size
    can reach the thousands — see semantic_dedup) the same argmax runs
    as one numpy matmul per Arrow batch (nearest_pivot_batched):
    the k×dim literal expression would otherwise grow into a
    megabyte-scale parse with k×dim interpreted fold ops per row.
    Both paths are shuffle-free over the corpus and share the
    (sim desc, pid asc) tie order; oracle-checked queries keep
    k ≤ literal_max so the bit-exact literal path decides.

    Returns (id, cluster_id, sim) where sim is the cosine to the final
    centroid the row is assigned to."""
    from .similarity import nearest_pivot_batched

    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    centroid_rows = collect_pivot_rows(
        vecs.orderBy(F.col("id").asc())
        .limit(k)
        .select(
            F.col("id").alias("cluster_id"),
            F.transform("vec", lambda x: _round6(x)).alias("centroid"),
        ),
        "cluster_id",
        "centroid",
    )

    def assign(cent_rows) -> DataFrame:
        if len(cent_rows) <= literal_max:
            # literal-centroid argmax: a single codegen projection over
            # the corpus — no join, no window, no shuffle
            return vecs.withColumn(
                "best", nearest_pivot("`vec`", cent_rows)
            ).select(
                "id",
                "vec",
                F.col("best.pid").alias("cluster_id"),
                (-F.col("best.nsim")).alias("sim"),
            )
        # large-k path: Arrow-batched numpy argmax, still shuffle-free
        return vecs.withColumn(
            "best", nearest_pivot_batched(cent_rows)(F.col("vec"))
        ).select(
            "id",
            "vec",
            F.col("best.pid").alias("cluster_id"),
            F.col("best.sim").alias("sim"),
        )

    for _ in range(iterations - 1):
        assigned = assign(centroid_rows)
        recomputed = (
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
        centroid_rows = collect_pivot_rows(
            recomputed, "cluster_id", "centroid"
        )
    return assign(centroid_rows).select("id", "cluster_id", "sim")
