"""Data-selection operators for LLM training pipelines.

Two families the curation literature treats as table stakes and the
reference (a DB-API cursor wrapper, etlhelper/etl.py) never had:

- **DSIR** (Data Selection with Importance Resampling, Xie et al.
  2023, arXiv:2302.03169): score every raw document by how much more
  likely its hashed n-gram features are under a small high-quality
  *target* corpus than under the *raw* corpus, then resample with
  Gumbel top-k on the importance weights. The published recipe is
  exactly bag-of-hashed-n-grams + two multinomials + log-ratio — all
  of it expressible as JVM-side Spark expressions over one corpus
  pass plus two bounded (``buckets``-row) distribution tables.

- **Benchmark decontamination** (the n-gram overlap rule of GPT-3
  appendix C / PaLM / Llama training reports): a training document is
  contaminated when more than a threshold fraction of its n-grams
  appear in an evaluation benchmark. The benchmark gram set is tiny
  next to the corpus, so the plan is one corpus pass + a broadcast
  semi-style join — the corpus never shuffles on gram.

Scale notes (100 TB):
- Feature extraction is explode + hash + partial-agg; the shuffle
  carries (doc, bucket) pairs capped by ``buckets`` per doc, not raw
  grams.
- Both bucket distributions are ``buckets``-row aggregates —
  broadcast back, never a corpus-side shuffle.
- Weight summation uses exact DECIMAL arithmetic so results are
  bit-identical under any partitioning (the determinism-sweep
  contract every incremental operator here follows).
- The final resample is ``orderBy(...).limit(n)`` — Spark plans
  TakeOrderedAndProject (per-partition top-n, then a single bounded
  merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64

__all__ = [
    "hashed_ngram_features",
    "bucket_log_probs",
    "dsir_log_weights",
    "gumbel_topk",
    "contamination_report",
    "repeat_to_budget",
]


def _tokens(text_col: Column) -> Column:
    """Whitespace tokens of lower-cased trimmed text (the convention
    every text operator in this package shares — text.py:37)."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def _grams(tokens: Column, n: int) -> Column:
    """All word n-grams of a token array (caller guards size >= n:
    Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """Per-document hashed bag-of-n-grams: (id, bucket, cnt).

    Documents shorter than *n* tokens contribute no rows (they carry
    no n-gram evidence; DSIR weights treat them as weight 0 — the
    target/raw ratio of an empty feature vector).

    The hash is the engine-reproducible 60-bit md5 prefix shared with
    the dedup family (_hash64), folded into [0, buckets) — a DuckDB
    oracle reproduces it exactly, and murmur/xxhash (engine-private)
    never leak into declared results."""
    t = _tokens(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("id"), t.alias("t"))
        .where(F.size("t") >= n)
        .select(
            "id", F.explode(_grams(F.col("t"), n)).alias("gram")
        )
        .select(
            "id",
            F.pmod(_hash64(F.col("gram"), seed), F.lit(buckets)).alias(
                "bucket"
            ),
        )
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def bucket_log_probs(
    features: DataFrame,
    buckets: int,
    alpha: float = 1.0,
    out_col: str = "logp",
) -> DataFrame:
    """Smoothed multinomial over hash buckets: (bucket, logp) for ALL
    buckets 0..buckets-1 (absent buckets get the additive-smoothing
    floor, so the log-ratio is defined everywhere).

    logp = ln((cnt_b + alpha) / (total + alpha*buckets)). The result
    is a *buckets*-row table — broadcast it into the weight join; at
    100 TB the corpus-sized work is the one partial-agg that produced
    *features*."""
    spark = features.sparkSession
    counts = features.groupBy("bucket").agg(
        F.sum("cnt").alias("cnt_b")
    )
    total = features.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("total")
    )
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    return (
        grid.join(F.broadcast(counts), "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("cnt_b"), F.lit(0)) + F.lit(alpha))
                / (F.col("total") + F.lit(alpha) * F.lit(buckets))
            ).alias(out_col),
        )
    )


def dsir_log_weights(
    raw_features: DataFrame,
    target_logp: DataFrame,
    raw_logp: DataFrame,
    weight_dp: int = 6,
    lratio_dp: int = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight: (id, weight) with
    weight = round(sum_b cnt_b * (logp_target - logp_raw), dp).

    Each bucket's log-ratio is quantized to DECIMAL(30,*lratio_dp*)
    BEFORE the sum (one rounding of the double, then exact decimal
    multiply-accumulate) so the aggregate is order- and
    partition-independent — double summation order would not be. The
    quantum is deliberately as coarse as the output (6dp, not 10):
    engines disagree about a double's decimal-cast only within ~1 ulp
    (~1e-16) of a rounding boundary, so a 1e-6 quantum makes the
    per-bucket collision probability ~1e-10 — at 10dp it is ~1e-4 per
    corpus, and a DuckDB-vs-JVM ln() ulp was measured tripping exactly
    that on the sf0.01 corpus. Both distribution tables are
    bucket-keyed bounded frames and broadcast; the only corpus-sized
    input is *raw_features*."""
    lt = target_logp.select(
        "bucket", F.col(target_logp.columns[-1]).alias("_lt")
    )
    lr = raw_logp.select(
        "bucket", F.col(raw_logp.columns[-1]).alias("_lr")
    )
    ratio = lt.join(lr, "bucket").select(
        "bucket",
        (F.col("_lt") - F.col("_lr"))
        .cast(f"decimal(30,{lratio_dp})")
        .alias("_lratio"),
    )
    return (
        raw_features.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.round(
                F.sum(F.col("cnt") * F.col("_lratio")), weight_dp
            )
            .cast("double")
            .alias("weight")
        )
    )


def gumbel_topk(
    weights: DataFrame,
    n: int,
    seed: int = 13,
    temperature: float = 1.0,
    id_col: str = "id",
    weight_col: str = "weight",
    key_dp: int = 6,
) -> DataFrame:
    """Deterministic Gumbel top-k resample: (id, weight, key, rank),
    the *n* rows with the largest perturbed keys.

    key = weight/temperature + Gumbel(0,1) where the Gumbel noise is
    a HASH of (seed, id) — g = -ln(-ln(u)), u = (h%M + 0.5)/M — so the
    sample is reproducible across engines, partitionings, and runs
    (the same trick the weighted-sample state uses; Gumbel-max over
    exp(weight) IS importance sampling without replacement). The
    selection is orderBy(key desc, id).limit(n): Spark plans
    TakeOrderedAndProject — per-partition heaps, one bounded merge —
    never a global sort; the row_number ranks only the n survivors."""
    m = 1_000_000
    u = (
        F.pmod(_hash64(F.col(id_col).cast("string"), seed), F.lit(m))
        + F.lit(0.5)
    ) / F.lit(float(m))
    key = F.round(
        (
            (F.col(weight_col) / F.lit(temperature))
            + (-F.log(-F.log(u)))
        ).cast("decimal(30,10)"),
        key_dp,
    ).cast("double")
    picked = (
        weights.select(
            F.col(id_col).alias("id"),
            F.col(weight_col).alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(n)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("key"), F.asc("id"))
    return picked.withColumn("rank", F.row_number().over(w))


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    threshold: float = 0.05,
    ratio_dp: int = 6,
) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction
    of its word n-grams that appear anywhere in *benchmark* —
    (id, n_grams, n_hit, ratio, contaminated).

    The GPT-3/PaLM recipe: build the benchmark's distinct n-gram set
    (tiny — benchmarks are MBs, corpora are TBs), broadcast it, and
    count per-doc distinct hits in ONE corpus pass. Docs with zero
    hits are kept (left join) — a decontamination report that silently
    drops clean docs would be useless as a filter feed. Docs shorter
    than *n* tokens have no n-grams and are reported with n_grams=0,
    ratio=0.0 (nothing to leak). ratio counts DISTINCT grams on both
    sides, so a single leaked sentence repeated in one doc cannot
    dilute or inflate the verdict."""
    bcol = bench_text_col or text_col
    t = _tokens(F.col(text_col))
    bt = _tokens(F.col(bcol))
    needles = (
        benchmark.select(bt.alias("t"))
        .where(F.size("t") >= n)
        .select(F.explode(_grams(F.col("t"), n)).alias("gram"))
        .distinct()
    )
    grams = (
        docs.select(F.col(id_col).alias("id"), t.alias("t"))
        .select(
            "id",
            F.when(
                F.size("t") >= n, _grams(F.col("t"), n)
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("g"),
        )
        .select("id", F.explode_outer(F.array_distinct("g")).alias("gram"))
    )
    hits = (
        grams.join(
            F.broadcast(needles.withColumn("_hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("id")
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        F.round(
            (F.col("n_hit") / F.col("n_grams")).cast(
                "decimal(30,10)"
            ),
            ratio_dp,
        ).cast("double"),
    ).otherwise(F.lit(0.0))
    return hits.select(
        "id",
        "n_grams",
        "n_hit",
        ratio.alias("ratio"),
        (ratio > F.lit(threshold)).alias("contaminated"),
    )


def repeat_to_budget(
    df: DataFrame,
    budgets: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    seed: str = "rep",
    partial_buckets: int = 4096,
) -> DataFrame:
    """DATA-CONSTRAINED UPSAMPLING — turn per-source token quotas
    (q220's temperature mix output, or any (source, budget_tokens)
    frame) into an explicit EPOCH PLAN over the documents: when a
    source's quota exceeds its size, its documents REPEAT — the
    data-constrained-training move (repeat small high-quality sources
    for multiple epochs instead of diluting the mix) — and the
    fractional remainder admits a deterministic partial epoch.
    Returns one row per (document, epoch):
    ``(<id_col>, <source_col>, n_tokens, epoch)`` where epoch is
    0-based; a document appearing in ``full + 1`` epochs was admitted
    to the partial one.

    Exact policy (restatable in SQL — the q282 oracle): per source,
    ``full = floor(budget / source_tokens)`` whole epochs, then the
    remainder ``budget - full * source_tokens`` admits documents in
    md5(seed || id) priority order while the running token sum stays
    below it (q208's race, same hash convention, so the partial epoch
    is reproducible across runs, engines, and partitionings — and
    DISJOINT sampling concerns stay upstream: feed this operator the
    already-cleaned corpus).

    Distributed shape: one per-source aggregate (combinable) for
    sizes, a broadcast join of the |sources|-row plan, and an explode
    of ``sequence(0, full-1)`` (rows grow by the repeat factor —
    exactly the output's size, nothing amplifies beyond it). The
    partial-epoch race is a TWO-LEVEL cumsum, never a per-source
    window over the corpus: the md5 priority's own hex prefix is a
    contiguous RANGE bucket (prefix order == lexicographic order ==
    race order, so bucket b's rows all precede bucket b+1's), per-
    (source, bucket) token sums roll up in one combinable aggregate,
    a bucket-level window (≤ *partial_buckets* rows per source —
    bounded frame) turns them into bucket prefix offsets, buckets
    whose offset already exceeds the remainder are PRUNED before any
    corpus-sized shuffle (the remainder is under one epoch, so almost
    every bucket drops), and only the surviving sliver takes the
    within-bucket cumsum, partitioned (source, bucket) — at 100 TB no
    task ever sorts more than ~1/partial_buckets of a source, and the
    candidate join is AQE-broadcastable precisely because the pruned
    bucket list is remainder-sized. Loud by construction (the
    pack_token_windows convention): a corpus source with no budget
    row, a budget source absent from the corpus, or a NULL budget
    fails the job from the executor — an inner join would silently
    zero that source's epochs (a typo'd quota line vanishing a source
    from training data with no gate firing)."""
    from pyspark.sql import Window

    if tokens_col is not None:
        ntok = F.col(tokens_col).cast("long")
    else:
        ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast(
            "long"
        )
    b = budgets.select(
        F.col(budgets.columns[0]).alias("__src"),
        F.col(budgets.columns[1]).cast("long").alias("__budget"),
    )
    docs = df.select(
        F.col(id_col),
        F.col(source_col),
        ntok.alias("n_tokens"),
        F.md5(
            F.concat(
                F.lit(str(seed) + ":"), F.col(id_col).cast("string")
            )
        ).alias("__pri"),
    )
    totals = docs.groupBy(source_col).agg(
        F.sum("n_tokens").alias("__total")
    )
    # FULL outer + executor raise: a source on only one side (or a
    # NULL quota) is a broken quota table, not an empty plan. The
    # check rides __full's projection, which every consumer of the
    # plan evaluates for every plan row (broadcast build / join
    # stream), so a budget-only source raises even though it joins
    # no documents.
    joined = totals.join(
        F.broadcast(b), totals[source_col] == b["__src"], "full_outer"
    )
    bad_src = F.raise_error(
        F.concat(
            F.lit("repeat_to_budget: source "),
            F.coalesce(
                F.col(source_col).cast("string"),
                F.col("__src").cast("string"),
                F.lit("NULL"),
            ),
            F.lit(
                " is missing from one side (corpus/budgets) or has a"
                " NULL budget — the epoch plan would silently drop it"
            ),
        )
    )
    n_full = F.floor(F.col("__budget") / F.col("__total")).cast("long")
    # coalesce the key: a budget-only source leaves totals' key NULL,
    # and the inner join's implicit isnotnull(key) would discard the
    # row BEFORE its raising projection ran — coalescing keeps it in
    # the broadcast build, where __full's check fires
    plan = joined.select(
        F.coalesce(F.col(source_col), F.col("__src")).alias(source_col),
        F.when(
            F.col(source_col).isNull()
            | F.col("__src").isNull()
            | F.col("__budget").isNull(),
            bad_src.cast("long"),
        )
        .otherwise(n_full)
        .alias("__full"),
        (F.col("__budget") - n_full * F.col("__total")).alias("__rem"),
    )
    base = docs.join(F.broadcast(plan), source_col)
    whole = base.where(F.col("__full") > 0).select(
        id_col,
        source_col,
        "n_tokens",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("__full") - 1)
        ).alias("epoch"),
    )
    # Two-level partial-epoch race. Bucket = a monotone map of the
    # priority's first 4 hex chars, so buckets are CONTIGUOUS ranges
    # of the race order; a NULL priority (null id) buckets to 0,
    # matching the window's nulls-first ascending order.
    nb = max(1, min(int(partial_buckets), 65536))
    bhex = F.conv(F.substring("__pri", 1, 4), 16, 10).cast("long")
    bucketed = base.withColumn(
        "__bkt",
        F.coalesce(
            F.floor(bhex * F.lit(nb) / F.lit(65536)).cast("long"),
            F.lit(0).cast("long"),
        ),
    )
    # bucket offsets: ≤ nb rows per source reach this window (the
    # bounded-frame contract — the aggregate collapsed the corpus)
    wb = (
        Window.partitionBy(source_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = (
        bucketed.groupBy(source_col, "__bkt")
        .agg(F.sum("n_tokens").alias("__bsum"))
        .withColumn(
            "__boff", F.sum("__bsum").over(wb) - F.col("__bsum")
        )
        .join(F.broadcast(plan.select(source_col, "__rem")), source_col)
        # prune BEFORE the corpus-sized shuffle: a bucket whose
        # prefix offset already covers the remainder admits nothing
        .where(F.col("__boff") < F.col("__rem"))
        .select(source_col, "__bkt", "__boff")
    )
    # no broadcast hint: typically remainder-sized (AQE converts to
    # broadcast at runtime); when it is not, the shuffle join's
    # (source, __bkt) partitioning is exactly the window's, so
    # Catalyst inserts no second exchange
    w = (
        Window.partitionBy(source_col, "__bkt")
        .orderBy("__pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        bucketed.join(cand, [source_col, "__bkt"])
        .withColumn(
            "__cum_before",
            F.col("__boff") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
        .where(F.col("__cum_before") < F.col("__rem"))
        .select(
            id_col,
            source_col,
            "n_tokens",
            F.col("__full").alias("epoch"),
        )
    )
    return whole.unionByName(partial)
