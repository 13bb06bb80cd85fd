"""Similarity search over embedding columns (array<float>).

Two paths, one kernel:

- brute_force_topk: exact — broadcast the (small) query set against
  the corpus, one pass, no shuffle of the corpus at all. The right
  baseline and the right answer whenever |queries| is small.
- lsh_bucket_topk: approximate — random-hyperplane LSH buckets both
  sides so candidate generation is an equi-join on bucket signature;
  the scale path when both sides are huge.

The cosine kernel is a pure built-in expression
(zip_with + aggregate), evaluated JVM-side inside codegen — no Python,
no UDF serialization, vectorizable over 100 TB.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# broadcast memo for nearest_pivot_batched: (appId, pivot digest) ->
# Broadcast. Bounded; eviction unpersists (see nearest_pivot_batched).
_PIVOT_BC_CACHE: OrderedDict = OrderedDict()
_PIVOT_BC_CACHE_MAX = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns.

    A zero vector yields -1.0 (minimal similarity — it matches
    nothing) instead of an ANSI divide-by-zero error: DuckDB's
    list_cosine_similarity returns -1.0 for the same input, so the
    oracles agree, and degenerate corpus rows lose every
    argmax/top-k instead of killing the job. try_divide (NULL on zero
    divisor) + coalesce, NOT a CASE on the divisor: a CASE mentions
    the norm product twice (condition and division), and inside the
    argmax fold that doubled the per-pivot work — measured 6x on the
    k-means assignment scan."""
    return F.coalesce(
        F.try_divide(_dot(a, b), _norm(a) * _norm(b)), F.lit(-1.0)
    )


# ----------------------------------------------------------------------
# shuffle-free nearest-pivot assignment
# ----------------------------------------------------------------------
# Assigning every corpus row to its nearest pivot/centroid used to be
# expressed as broadcast-join(row × pivots) + Window(row_number) — the
# join expands the corpus nlist×, and the window then SHUFFLES AND
# SORTS the expanded set just to keep rank 1. At 100 TB with nlist=16
# that is a 16×-corpus shuffle per index build / Lloyd iteration. The
# pivot set is bounded (nlist/k rows — the same bounded-driver contract
# as query_ivf_index's probe-id list), so it can be collected and
# embedded as a LITERAL array of (id, vector) structs; the per-row
# argmax is then a pure codegen fold — zero expansion, zero shuffle.


def collect_pivot_rows(
    pivots: DataFrame, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """Collect a bounded pivot/centroid set to the driver, ordered by
    id. Deliberate: ≤ nlist rows × dim floats, the literal form is what
    eliminates the assignment shuffle."""
    return [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in pivots.select(id_col, vec_col).orderBy(id_col).collect()
    ]


def _dlit(x: float) -> str:
    """An exact double literal for SQL text: repr() is Python's
    shortest round-trip form, and a string→double CAST re-parses it to
    the identical IEEE-754 value on the JVM side."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        return f"CAST('{x}' AS DOUBLE)"
    return f"CAST('{x!r}' AS DOUBLE)"


def _dot_sql(a: str, b: str) -> str:
    """SQL text mirror of :func:`_dot` — parses to the identical
    Catalyst tree (same casts, same fold order)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    """SQL text mirror of :func:`_norm`."""
    return (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v))"
    )


def _cos_sql(a: str, b: str) -> str:
    """SQL text mirror of :func:`cosine_similarity`."""
    return (
        f"coalesce(try_divide({_dot_sql(a, b)}, "
        f"{_norm_sql(a)} * {_norm_sql(b)}), -1.0D)"
    )


def _pivot_scores(vec, pivot_rows) -> Column:
    """Literal pivot array scored against *vec*: array of structs
    (nsim, pid) where nsim = -cosine, so natural struct ordering
    (ascending) ranks by similarity DESC, pivot id ASC — the identical
    total order the Window.orderBy(desc(sim), asc(id)) form used.

    The literal is built as ONE parsed SQL expression, not per-element
    Column objects: nlist × dim F.lit() calls each cost a py4j round
    trip (~2s of driver time for 16×64 at every query build), while
    one expr() string parses in milliseconds and constant-folds to the
    same literal array.

    *vec* may be a Column or a SQL text fragment (str). The str form
    builds the ENTIRE scored array — pivot literal, cosine fold,
    struct projection — as one parsed expr: the Column form still
    pays ~300 py4j round trips (~0.15 s) assembling the lambda
    machinery per call, which multiplied across encode loops
    (m_sub + 1 calls per batch) and probe builds dominated the ANN
    lifecycles' driver time; the parsed tree is node-identical, so
    results are bit-equal (verified element-wise at 5k rows)."""
    elems = ", ".join(
        "named_struct('pid', {pid}L, 'pivot', array({vals}))".format(
            pid=int(pid), vals=", ".join(_dlit(x) for x in pvec)
        )
        for pid, pvec in pivot_rows
    )
    if isinstance(vec, str):
        return F.expr(
            f"transform(array({elems}), p -> named_struct("
            f"'nsim', -({_cos_sql(vec, 'p.pivot')}), 'pid', p.pid))"
        )
    pivot_lit = F.expr(f"array({elems})")
    return F.transform(
        pivot_lit,
        lambda p: F.struct(
            (-cosine_similarity(vec, p["pivot"])).alias("nsim"),
            p["pid"].alias("pid"),
        ),
    )


def nearest_pivot(vec, pivot_rows) -> Column:
    """Struct (nsim, pid) of the nearest pivot to *vec* — argmax as
    array_min over the scored literal array, entirely inside codegen.
    *vec*: Column, or a SQL fragment (str) for the one-parse fast
    build (see _pivot_scores)."""
    return F.array_min(_pivot_scores(vec, pivot_rows))


def nearest_pivots(vec, pivot_rows, n: int) -> Column:
    """The *n* nearest pivots to *vec* as a sorted array of structs
    (nsim, pid) — the probe-side top-n, also shuffle-free."""
    return F.slice(F.array_sort(_pivot_scores(vec, pivot_rows)), 1, n)


def nearest_pivot_batched(pivot_rows):
    """Arrow-batched numpy form of :func:`nearest_pivot` for LARGE
    pivot sets: returns a pandas UDF mapping a vector column to a
    struct (pid long, sim double) of the nearest pivot.

    The literal-codegen argmax is the right plan up to a few dozen
    pivots; past that the k×dim literal expression grows into a
    megabyte-scale parse and the per-row fold does k×dim interpreted
    higher-order ops (k=782, dim=64 → 50k ops/row). Here the pivot
    matrix ships as a SparkContext broadcast (once per executor, not
    per task — same bounded-driver contract as collect_pivot_rows) and
    one numpy matmul per Arrow batch scores every (row, pivot) pair at
    once — the identical move lsh_signatures makes, ~µs/row.

    Tie-break parity: pivot_rows arrive sorted by pid ascending and
    np.argmax returns the FIRST maximum, so ties resolve to the lowest
    pid — the same (sim desc, pid asc) total order the literal path's
    struct ordering encodes. Zero vectors (either side) score -1.0,
    matching cosine_similarity's try_divide/coalesce contract. The two
    paths may differ by one ulp on near-exact ties (fold vs pairwise
    summation); oracle-checked queries pin k small enough to stay on
    the literal path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    pids = np.array([int(p) for p, _ in pivot_rows], dtype=np.int64)
    C = np.array([v for _, v in pivot_rows], dtype=np.float64)  # (k, dim)
    cn = np.sqrt((C * C).sum(axis=1))  # (k,)

    # ship the pivot matrix as a Spark broadcast, not a pickled
    # closure: a closure is re-serialized into every task launch,
    # and at derived-k scale (k ≈ n/256 × dim doubles) that is tens
    # of MB per task; a broadcast moves it once per executor.
    # MEMOIZED per (session, pivot-content digest): kmeans calls this
    # once per Lloyd iteration with recomputed (usually different)
    # centroids, and an unbounded stream of broadcasts would pin
    # executor memory for the session's lifetime — repeated identical
    # pivot sets reuse one broadcast, and eviction unpersists the
    # oldest entries past a small cap.
    from pyspark.sql import SparkSession

    _sess = SparkSession.getActiveSession()
    if _sess is not None:
        import hashlib

        key = (
            _sess.sparkContext.applicationId,
            hashlib.md5(pids.tobytes() + C.tobytes()).hexdigest(),
        )
        _bc = _PIVOT_BC_CACHE.get(key)
        if _bc is None:
            _bc = _sess.sparkContext.broadcast((pids, C, cn))
            _PIVOT_BC_CACHE[key] = _bc
            while len(_PIVOT_BC_CACHE) > _PIVOT_BC_CACHE_MAX:
                _, old = _PIVOT_BC_CACHE.popitem(last=False)
                try:
                    old.unpersist()
                except Exception:
                    pass  # session torn down: nothing to release

        def _pivots():
            return _bc.value

    else:  # no active session (unit use): plain closure capture
        _local = (pids, C, cn)

        def _pivots():
            return _local

    # no annotations: returnType passed explicitly (hint inference
    # can't resolve struct returns under `from __future__ import
    # annotations` — same posture as lsh_signatures)
    def assign(v):
        p, cm, cnm = _pivots()
        if len(v) == 0:
            return pd.DataFrame({"pid": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        M = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        mn = np.sqrt((M * M).sum(axis=1))  # (n,)
        denom = mn[:, None] * cnm[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(denom > 0.0, (M @ cm.T) / denom, -1.0)
        best = sims.argmax(axis=1)
        return pd.DataFrame(
            {"pid": p[best], "sim": sims[np.arange(len(best)), best]}
        )

    return pandas_udf(
        assign,
        StructType(
            [
                StructField("pid", LongType()),
                StructField("sim", DoubleType()),
            ]
        ),
    )


def nearest_pivot_l2(vec, pivot_rows) -> Column:
    """Struct (ndist, pid) of the L2-NEAREST pivot — the Euclidean
    sibling of nearest_pivot for quantizers where MAGNITUDE matters
    (residual PQ: residual centroids are means, and assigning a small
    residual to a large same-direction centroid wrecks the
    reconstruction — exactly what cosine assignment does). Scored as
    ``||c||^2 - 2 v.c`` (the ||v||^2 term is constant per row, so the
    argmin is unchanged and the fold stays one dot per pivot); ties
    break (dist asc, pid asc) via natural struct ordering — same
    total-order discipline as the cosine kernel.

    *vec*: Column, or a SQL fragment (str) for the one-parse fast
    build (_pivot_scores' rationale; node-identical tree)."""
    elems = ", ".join(
        "named_struct('pid', {pid}L, 'pivot', array({vals}), "
        "'c2', {c2})".format(
            pid=int(pid),
            vals=", ".join(_dlit(x) for x in pvec),
            c2=_dlit(sum(float(x) * float(x) for x in pvec)),
        )
        for pid, pvec in pivot_rows
    )
    if isinstance(vec, str):
        dot = (
            f"aggregate(zip_with({vec}, p.pivot, (a, b) -> "
            f"CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x)"
        )
        return F.expr(
            f"array_min(transform(array({elems}), p -> named_struct("
            f"'ndist', p.c2 - 2.0D * {dot}, 'pid', p.pid)))"
        )
    pivot_lit = F.expr(f"array({elems})")
    dot = lambda p: F.aggregate(
        F.zip_with(vec, p["pivot"], lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.array_min(
        F.transform(
            pivot_lit,
            lambda p: F.struct(
                (p["c2"] - F.lit(2.0) * dot(p)).alias("ndist"),
                p["pid"].alias("pid"),
            ),
        )
    )


def nearest_pivot_l2_batched(pivot_rows):
    """Arrow-batched numpy form of :func:`nearest_pivot_l2` (the
    large-codebook path, nearest_pivot_batched's rationale): one
    matmul per Arrow batch scores ``||c||^2 - 2 v.c`` for every
    (row, pivot) pair; np.argmin returns the FIRST minimum so ties
    resolve to the lowest pid — the literal path's total order."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    pids = np.array([int(p) for p, _ in pivot_rows], dtype=np.int64)
    C = np.array([v for _, v in pivot_rows], dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    def assign(v):
        if len(v) == 0:
            return pd.DataFrame(
                {
                    "pid": pd.Series([], dtype="int64"),
                    "dist": pd.Series([], dtype="float64"),
                }
            )
        M = np.vstack(v.to_numpy()).astype(np.float64)
        scores = c2[None, :] - 2.0 * (M @ C.T)
        best = scores.argmin(axis=1)
        return pd.DataFrame(
            {
                "pid": pids[best],
                "dist": scores[np.arange(len(best)), best],
            }
        )

    return pandas_udf(
        assign,
        StructType(
            [
                StructField("pid", LongType()),
                StructField("dist", DoubleType()),
            ]
        ),
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query side is broadcast — the corpus never shuffles; each
    corpus partition computes its local similarities and the final
    top-k per query is a tiny shuffle of k rows per partition.
    Self-matches (same id) are excluded.
    """
    from .util import ensure_parallelism

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim", 4).alias("sim"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 10,
    nprobe: int = 2,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k cosine search.

    Index build: *nlist* pivot vectors (the lowest-id corpus rows —
    deterministic; a k-means step would refine them) are broadcast and
    every corpus vector is assigned to its nearest pivot. Search: each
    query probes its *nprobe* nearest pivots and exact cosine runs
    only within the probed inverted lists.

    Scale story: the corpus NEVER shuffles on assignment — the pivot
    set is bounded, so it is collected and embedded as a literal array
    and every row's nearest-pivot argmax runs as a codegen fold (see
    nearest_pivot above; the old broadcast-join + Window form was a
    nlist×-corpus shuffle). Each query scans ~nprobe/nlist of the
    corpus. Recall tracks how clustered the corpus is — near-random
    vectors give ≈ nprobe/nlist recall, real embedding corpora (which
    cluster strongly) far more; identical/near-identical vectors
    co-assign and are always found.
    """
    pivot_rows = collect_pivot_rows(
        corpus.orderBy(F.col(corpus_id).asc()).limit(nlist),
        corpus_id,
        vec_col,
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    c_assigned = c.select(
        "neighbor_id",
        "cv",
        nearest_pivot(F.col("cv"), pivot_rows)["pid"].alias("part"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    )
    q_probes = q.select(
        "query_id",
        "qv",
        F.explode(
            nearest_pivots(F.col("qv"), pivot_rows, nprobe)["pid"]
        ).alias("part"),
    )
    scored = (
        c_assigned.join(F.broadcast(q_probes), "part")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def _plane_matrix(num_planes_total: int, dim: int):
    """The (num_planes_total, dim) hyperplane coefficient matrix, from
    the md5 derivation the engine has always used: component i of plane
    s is (int(md5(f"{s}:{i}")[:8], 16) % 2001 - 1000) / 1000 —
    deterministic everywhere, no RNG state."""
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                (
                    int(
                        hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16
                    )
                    % 2001
                    - 1000
                )
                / 1000.0
                for i in range(dim)
            ]
            for s in range(num_planes_total)
        ]
    )


def lsh_signatures(num_tables: int, num_planes: int, dim: int):
    """Arrow-batched signature kernel: per input vector, the array of
    ``num_tables`` bucket signatures (one '0'/'1'-string of
    ``num_planes`` sign bits per table).

    A pandas UDF *by deliberate exception*: the pure-Column form is
    num_tables × num_planes interpreted higher-order folds per row
    (non-codegen, md5 per coefficient) — measured ~1.5 ms/row at 88
    planes, which is the whole query budget. One numpy matmul per
    Arrow batch computes every dot product at once (~µs/row), with
    bit-identical bucket assignment because the plane matrix is the
    same md5 derivation. Signatures are engine-internal (candidate
    generation only), so only determinism matters — and numpy float64
    matmul is deterministic for a fixed build."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    planes_t = _plane_matrix(num_tables * num_planes, dim).T  # (dim, total)

    # no annotations: hint inference can't resolve local imports under
    # `from __future__ import annotations`; returnType passed explicitly
    def sigs(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (m @ planes_t >= 0).astype(np.uint8)  # (n, total)
        chars = bits.astype("U1")
        out = [
            [
                "".join(row[t * num_planes : (t + 1) * num_planes])
                for t in range(num_tables)
            ]
            for row in chars
        ]
        return pd.Series(out)

    # explicit returnType (no type-hint inference: local annotations
    # aren't resolvable under `from __future__ import annotations`)
    return pandas_udf(sigs, ArrayType(StringType()))


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 1,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH signature buckets both
    sides, candidates are generated by an equi-join on (table, sig),
    then exact cosine ranks within the deduplicated candidate set.

    *num_tables* independent hash tables (the standard cosine-LSH
    construction) trade candidate volume for recall: a true neighbor
    with per-bit collision probability p = 1 - theta/pi is found with
    probability 1 - (1 - p^num_planes)^num_tables.  One table keeps
    the original behavior.

    At 1000-executor scale the bucket join replaces the cross join:
    shuffle keys are (table, 2^num_planes signatures), so skew is
    bounded by bucket balance (raise num_planes to split hot buckets);
    multi-table duplicates are eliminated first-collision-wins — a
    pair survives only in the EARLIEST table where its signatures
    collide, a pure codegen filter over the carried signature arrays,
    so no dedup shuffle ever materializes the duplicates.

    *max_bucket* caps the CORPUS side of every (table, sig) bucket:
    raising num_planes can't split a bucket of bit-identical
    signatures (a degenerate corpus region — e.g. thousands of
    zero/constant vectors — lands in ONE bucket at any plane count and
    makes the bucket join quadratic). The cap keeps the max_bucket
    lowest neighbor_ids per bucket, which is deterministic AND exactly
    the tie-break winners (sim desc, neighbor_id asc) when the bucket
    is degenerate-identical, so degenerate top-k survives the cap
    intact; in mixed oversized buckets a true neighbor ranked beyond
    the cap in every colliding table is lost — the recall/robustness
    tradeoff, measured in tests/test_lsh_bucket_cap.py. The cap's
    window partitions by the join key itself, so it reuses the bucket
    join's exchange — no extra shuffle. ``None`` disables it.
    """

    sig_kernel = lsh_signatures(num_tables, num_planes, dim)

    def tabled(
        side: DataFrame, id_alias: str, sig_alias: str, extra: list[str]
    ) -> DataFrame:
        # all table signatures in ONE Arrow-batched matmul, one
        # (tbl, sig) row per hash table — a static posexplode, no RNG.
        # The CORPUS side deliberately drops its vector column here:
        # the bucket join and cap window then shuffle ~30-byte
        # (tbl, sig, id, sigs) rows instead of num_tables copies of a
        # 512-byte vector — the vectors shuffle exactly ONCE, at the
        # rerank join below (measured 3.4x at 200k x 8 tables,
        # scripts/scale_probe.py).
        return side.withColumn(
            sig_alias, sig_kernel(F.col("__vec"))
        ).select(
            id_alias,
            *extra,
            sig_alias,
            F.posexplode(sig_alias).alias("tbl", "sig"),
        )

    from .util import ensure_parallelism

    q = tabled(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("__vec")
        ),
        "query_id",
        "sigs_q",
        extra=[F.col("__vec").alias("qv")],  # query side is bounded
    )
    corpus_vecs = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    c = tabled(
        corpus_vecs.select(
            "neighbor_id", F.col("cv").alias("__vec")
        ),
        "neighbor_id",
        "sigs_c",
        extra=[],
    )
    if max_bucket is not None:
        wb = Window.partitionBy("tbl", "sig").orderBy(F.asc("neighbor_id"))
        c = (
            c.withColumn("bpos", F.row_number().over(wb))
            .where(F.col("bpos") <= max_bucket)
            .drop("bpos")
        )
        # First-collision-wins must be SURVIVAL-aware under the cap: a
        # signature collision in an earlier table only produced a join
        # row if the neighbor survived that table's bucket cap — a
        # neighbor capped out of its earliest colliding bucket but
        # alive in a later one would otherwise be dropped in BOTH
        # (earlier row never exists, later row filtered by the bare
        # signature test), losing the pair entirely. alive_tbls is a
        # light per-neighbor aggregate of the capped exploded rows.
        alive = c.groupBy("neighbor_id").agg(
            F.collect_set("tbl").alias("alive_tbls")
        )
        earlier_collision = F.expr(
            "CASE WHEN tbl = 0 THEN false ELSE"
            " exists(sequence(0, tbl - 1),"
            "  t -> element_at(sigs_q, t + 1) = element_at(sigs_c, t + 1)"
            "   AND array_contains(alive_tbls, t)) END"
        )
        pairs = (
            c.join(q, ["tbl", "sig"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .join(alive, "neighbor_id")
            .where(~earlier_collision)
            .select("query_id", "qv", "neighbor_id")
        )
    else:
        earlier_collision = F.expr(
            "exists(zip_with(slice(sigs_q, 1, tbl), slice(sigs_c, 1, tbl),"
            " (x, y) -> x = y), coll -> coll)"
        )
        pairs = (
            c.join(q, ["tbl", "sig"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .where(~earlier_collision)
            .select("query_id", "qv", "neighbor_id")
        )
    scored = pairs.join(corpus_vecs, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: list[int] | None = None,
) -> DataFrame:
    """Distributed covariance over an embedding column — the
    second-moment aggregation behind PCA / ZCA whitening / Mahalanobis
    OOD scoring at corpus scale.

    Spark-first shape (the treeAggregate-of-Gram-matrices design, cf.
    Spark MLlib's RowMatrix): each partition folds its vectors into
    ONE (count, Σx, XᵀX) partial inside an Arrow-batched numpy kernel
    — d and d² doubles per PARTITION, not per row — and the partials
    merge through a tiny posexplode + sum (≤ partitions × d² rows,
    ~131k for d=64 at 32 partitions; the corpus itself never
    shuffles). Covariance then assembles JVM-side:
    cov(i,j) = (G_ij − S_i·S_j / n) / (n − 1), rounded through
    DECIMAL(30,10) to 6dp — the corpus-wide cross-engine float
    discipline (well above the ~1e-13 accumulation-order noise vs a
    single-pass covar_samp). try_divide keeps the degenerate n ≤ 1
    corpus NULL (covar_samp's contract) instead of an ANSI abort.

    *dims* are 1-based vector positions (default: every dimension,
    discovered from the first row). Returns the upper triangle:
    (i, j, n, cov) with i <= j, both 1-based.

    The d×d result is bounded (d ≤ a few thousand), so downstream
    eigendecomposition for PCA/whitening is a driver-side numpy step
    on the collected matrix — same bounded-driver contract as the
    pivot collection above. The returned frame is DRIVER-LOCAL
    (a VALUES literal of the bounded result), so nothing is cached or
    pinned in executor storage after the call — the corpus is scanned
    exactly once, by the partial collection itself.
    """
    dims, idx, d = _resolve_dims(df, vec_col, dims)
    n, s, g = _collect_gram(df, vec_col, idx, d)
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [], "i int, j int, n long, cov double"
        )
    entries = list(_cov_entries(dims, n, s, g))
    # d(d+1)/2 entries: a single VALUES text parses fastest at the
    # common d (d=64 -> 2080 tuples), but a d=2000 triangle is ~2M
    # tuples in ONE SQL string — parser/driver blowup (ADVICE r6) —
    # so large triangles go through createDataFrame instead
    if len(entries) > 50_000:
        return spark.createDataFrame(
            [
                (i, j, nn, None if c is None else float(c))
                for i, j, nn, c in entries
            ],
            "i int, j int, n long, cov double",
        )
    vals = ", ".join(
        "({i}, {j}, {n}L, {c})".format(
            i=i, j=j, n=nn,
            c="CAST(NULL AS DOUBLE)" if c is None else _dlit(c),
        )
        for i, j, nn, c in entries
    )
    return spark.sql(
        f"SELECT col1 AS i, col2 AS j, col3 AS n, col4 AS cov "
        f"FROM VALUES {vals}"
    )


def _resolve_dims(df: DataFrame, vec_col: str, dims: list[int] | None):
    """(dims, 0-based index array, d) with dims defaulting to every
    vector position, discovered from the first row."""
    import numpy as np

    if dims is None:
        d0 = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dims = list(range(1, int(d0["d"]) + 1))
    idx = np.array([p - 1 for p in dims], dtype=np.int64)
    return dims, idx, len(idx)


def _collect_gram(df: DataFrame, vec_col: str, idx, d: int):
    """One (count, Σx, XᵀX) Gram partial per partition, merged
    DRIVER-SIDE: the corpus folds into |partitions| rows of
    1 + d + d² doubles inside an Arrow-batched numpy kernel (the
    corpus itself never shuffles and never expands), those partials
    collect in one job, and numpy sums them on the driver — bounded
    work (≤ partitions × d² doubles). Returns (n, s[d], G[d×d]).

    This replaces the earlier cached-partials design (ADVICE r5: the
    cache stayed pinned after embedding_covariance returned): with the
    merge driver-side there is nothing to cache — ONE corpus scan
    total, one job, zero executor storage. Partial-merge order is the
    collect order; the 6dp DECIMAL rounding downstream absorbs the
    ~1e-13 accumulation-order noise exactly as it did for the JVM
    aggregation's nondeterministic partial order."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        n = 0
        s = np.zeros(d, dtype=np.float64)
        g = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)[
                :, idx
            ]
            n += X.shape[0]
            s += X.sum(axis=0)
            g += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        return 0, np.zeros(d), np.zeros((d, d))
    n = int(sum(r["n"] for r in rows))
    s = np.sum([np.array(r["s"], dtype=np.float64) for r in rows], axis=0)
    g = np.sum(
        [np.array(r["g"], dtype=np.float64).reshape(d, d) for r in rows],
        axis=0,
    )
    return n, s, g


def _cov_entries(dims: list[int], n: int, s, g):
    """Upper-triangle covariance rows [(i, j, n, cov)] in caller-dims
    position order, labels = dim numbers, with the engine's exact
    arithmetic and rounding contract: cov = (G_ij − S_i·S_j/n)/(n−1)
    in IEEE double (same association as the former JVM expression),
    then the DECIMAL(30,10)→6dp HALF_UP two-step (_round6_py, the
    bit-for-bit driver mirror). n ≤ 1 yields None (try_divide's NULL
    contract)."""
    out = []
    d = len(dims)
    for a in range(d):
        for b in range(a, d):
            if n <= 1:
                cov = None
            else:
                cov = _round6_py((g[a][b] - s[a] * s[b] / n) / (n - 1))
            out.append((int(dims[a]), int(dims[b]), n, cov))
    return out


def _corpus_moments(
    df: DataFrame,
    vec_col: str,
    dims: list[int] | None,
    round_means: bool,
):
    """Driver-side (pos, n, mu, S) from ONE Gram pass: the covariance
    matrix S assembles through the same arithmetic-and-rounding
    contract as embedding_covariance (_cov_entries — identical values
    to q173's oracle-proven path), and the means derive as Σx/n from
    the SAME partials instead of a second corpus scan — two corpus
    scans total for whiten/mahalanobis (moments + projection), as
    designed. ``round_means`` applies the 6dp decimal contract to the
    means (the cross-engine literal discipline); unrounded means keep
    full precision for engine-internal use."""
    import numpy as np

    dims, idx, d = _resolve_dims(df, vec_col, dims)
    n, s, g = _collect_gram(df, vec_col, idx, d)
    if n == 0:
        raise ValueError("corpus moments: empty corpus")
    entries = _cov_entries(dims, n, s, g)
    pos = sorted({e[0] for e in entries} | {e[1] for e in entries})
    pidx = {p: k for k, p in enumerate(pos)}
    S = np.zeros((d, d))
    for i, j, _n, cov in entries:
        if cov is None:
            raise ValueError("corpus moments: covariance undefined (n <= 1)")
        S[pidx[i], pidx[j]] = cov
        S[pidx[j], pidx[i]] = cov
    # the Gram 's' array is in CALLER dims order; S/pos (and every
    # consumer's projection index) are in sorted-label order — key the
    # sums by dim label so unsorted dims (e.g. dims=[3,1]) subtract the
    # right means (tests/test_similarity_moments.py pins this)
    s_by_dim = {int(dims[k]): float(s[k]) for k in range(d)}
    mu = np.array([s_by_dim[p] for p in pos]) / n
    if round_means:
        mu = np.array([_round6_py(m) for m in mu])
    return pos, int(n), mu, S


def _round6_py(x: float) -> float:
    """Driver-side mirror of the corpus-wide 6dp contract
    ``round(CAST(x AS DECIMAL(30,10)), 6)``: quantize to 10dp
    HALF_UP (the double→DECIMAL(30,10) cast), then to 6dp HALF_UP —
    the same two-step rounding, so a literal computed here matches
    the JVM/DuckDB value bit-for-bit."""
    from decimal import ROUND_HALF_UP, Decimal

    q10 = Decimal(repr(float(x))).quantize(
        Decimal("0.0000000001"), rounding=ROUND_HALF_UP
    )
    return float(q10.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def whiten_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: list[int] | None = None,
    eps: float = 1e-9,
    out_col: str = "whitened",
) -> DataFrame:
    """ZCA-whiten an embedding column: W = Σ^(−1/2) from the
    distributed covariance (embedding_covariance), applied per row as
    one numpy matvec per Arrow batch.

    The split of work IS the design: the only corpus-sized passes are
    the Gram aggregation (no shuffle, no expansion) and the final
    projection scan; the eigendecomposition of the bounded d×d matrix
    happens driver-side (numpy.linalg.eigh, symmetric), and W ships to
    executors as a broadcast. Eigenvalues are floored at *eps* so a
    rank-deficient corpus (duplicated dims, n < d) whitens the
    spanned subspace instead of exploding. Output keeps every input
    column and appends *out_col* (array<double>, centered and
    whitened: cov(out) ≈ I on the spanned subspace)."""
    import numpy as np

    pos, _n, mu, S = _corpus_moments(df, vec_col, dims, round_means=False)
    w_eig, V = np.linalg.eigh(S)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(w_eig, eps))) @ V.T

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    sess = SparkSession.getActiveSession()
    bc = sess.sparkContext.broadcast((np.array(pos) - 1, mu, W))

    def project(v):
        import pandas as pd

        idx, mu_, W_ = bc.value
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy()).astype(np.float64)[:, idx]
        Y = (X - mu_) @ W_.T
        return pd.Series(list(Y))

    return df.withColumn(
        out_col, pandas_udf(project, ArrayType(DoubleType()))(F.col(vec_col))
    )


def mahalanobis_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: list[int] | None = None,
    eps: float = 1e-9,
    out_col: str = "md2",
) -> DataFrame:
    """Squared Mahalanobis distance of every row to the corpus
    distribution — the covariance-aware OOD / anomaly score:
    md² = (x − μ)ᵀ Σ⁻¹ (x − μ).

    Same decomposition as whiten_embeddings: Σ from the shuffle-free
    Gram aggregation, inverted driver-side (eigendecomposition with
    eigenvalues floored at *eps* — a pseudo-inverse on rank-deficient
    corpora), broadcast, then one quadratic form per row inside an
    Arrow batch. Two corpus scans total, no shuffle, no expansion.
    The 2-dim closed form of the same quantity is oracle-verified in
    q174; this generic-d kernel is pinned against it in tests."""
    import numpy as np

    pos, _n, mu, S = _corpus_moments(df, vec_col, dims, round_means=True)
    w_eig, V = np.linalg.eigh(S)
    P = V @ np.diag(1.0 / np.maximum(w_eig, eps)) @ V.T  # Σ^-1

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    sess = SparkSession.getActiveSession()
    bc = sess.sparkContext.broadcast((np.array(pos) - 1, mu, P))

    def score(v):
        import pandas as pd

        idx, mu_, P_ = bc.value
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        X = np.vstack(v.to_numpy()).astype(np.float64)[:, idx] - mu_
        return pd.Series(np.einsum("ij,jk,ik->i", X, P_, X))

    return df.withColumn(
        out_col, pandas_udf(score, DoubleType())(F.col(vec_col))
    )
