"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Design notes for 100 TB:

- exact dedup is a single hash-aggregate on a fingerprint column —
  one shuffle on the fingerprint, map-side combined.
- MinHash signatures are computed with explode + groupBy(min) over
  md5-derived hash values (reproducible across engines, unlike
  engine-native hash functions); LSH banding turns all-pairs
  comparison into an equi-join on (band, band_signature) buckets, so
  the shuffle is on bucket keys and candidate verification touches only
  colliding pairs.
- SimHash is a linear scan + one groupBy per document (bit-vote).
- all joins carry the smaller side broadcast when below threshold;
  pair generation always enforces id_a < id_b to halve the work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import document_fingerprint


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    keep: str = "first",
) -> DataFrame:
    """Keep one representative row per distinct content.

    Survivor policy ``keep``:
    - ``"first"``  — lowest id (deterministic default)
    - ``"last"``   — highest id (latest-wins, CDC-style)
    - ``"longest"``— longest text, id as tie-break (keeps the most
      complete variant when near-identical records normalize equal)

    Single shuffle on the fingerprint; row_number picks the survivor.
    Scales as a plain hash aggregate — including under MASS
    duplication: Catalyst's rank-limit pushdown plants a Partial
    WindowGroupLimit below the exchange, so every map task reduces
    to one row per fingerprint BEFORE the shuffle and a boilerplate
    page duplicated millions of times never concentrates in one
    task (plan-asserted in tests/test_plans.py).
    """
    fp = (
        document_fingerprint(F.col(text_col))
        if normalize
        else F.md5(F.col(text_col))
    )
    order = {
        "first": [F.col(id_col).asc()],
        "last": [F.col(id_col).desc()],
        "longest": [F.length(F.col(text_col)).desc(), F.col(id_col).asc()],
    }[keep]
    keyed = df.withColumn("__fp", fp)
    w = Window.partitionBy("__fp").orderBy(*order)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# ----------------------------------------------------------------------
# shingling + MinHash + LSH
# ----------------------------------------------------------------------
def _shingles(text_col: str, n: int) -> Column:
    """Distinct word n-gram shingles of the lowercased text.

    A document SHORTER than n tokens has no n-gram shingles — the
    explicit empty-array branch, matching the oracle's
    ``range(1, len(t)-n+2)`` (empty for short docs). Without it,
    ``sequence(0, size-n)`` runs DESCENDING for short docs and feeds
    negative starts into slice(), which throws — found by the
    incremental-dedup empty/short-batch tests."""
    tokens = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    if n == 1:
        return F.array_distinct(tokens)
    # sliding window of n tokens joined by single spaces
    return F.array_distinct(
        F.when(
            F.size(tokens) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tokens) - n),
                lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def _hash64(col: Column, seed: int) -> Column:
    """Deterministic, engine-reproducible 60-bit hash: first 15 hex
    chars of md5(seed || value). Fits a signed BIGINT in any engine."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 15), 16, 10
    ).cast("long")


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int
) -> DataFrame:
    """(id, shingle) exploded table of distinct shingles per doc."""
    from .util import ensure_parallelism

    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, shingle_size)).alias("shingle"),
    ).where(F.col("shingle") != "")


MINHASH_PRIME = 2147483647  # 2^31 - 1


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """MinHash signature per document: min over the document's shingles
    of *num_hashes* universal-hash functions.

    Each shingle is md5-hashed ONCE (the only expensive hash), then
    the k seeded hashes derive arithmetically:
    ``h_i = ((2i+3)·h0 + (5i+7)) mod (2^31-1)``. All k minima compute
    as k aggregate columns in a single groupBy — no seed explosion, so
    the shuffle is one row per document instead of k rows per
    (document, seed). Output: (id, seed, minhash) long format.
    """
    wide = _minhash_wide(df, id_col, text_col, num_hashes, shingle_size)
    stack_args = ", ".join(f"{i}, mh_{i}" for i in range(num_hashes))
    return wide.select(
        "id",
        F.expr(f"stack({num_hashes}, {stack_args}) AS (seed, minhash)"),
    )


def _minhash_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_size: int,
) -> DataFrame:
    """Wide minhash intermediate: one row per doc, mh_0..mh_{k-1}.

    All k minima compute as k aggregate columns in a single groupBy —
    no seed explosion, so the shuffle is one row per (doc, shingle)
    instead of k rows per (doc, shingle, seed). Both the long-format
    public signatures and the banding stage project off this, so band
    keys never pay a second shuffle."""
    shingles = shingle_table(df, id_col, text_col, shingle_size)
    h0 = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long")
        % MINHASH_PRIME
    )
    hashed = shingles.select("id", h0.alias("h0"))
    # large odd multipliers (Knuth constant mixing) decorrelate the
    # derived hash functions; small coefficients would make band keys
    # collide together and inflate LSH false positives
    aggs = [
        F.min(
            (
                ((2654435761 * (i + 1)) % MINHASH_PRIME) * F.col("h0")
                + (40503 * (i * i + 1)) % MINHASH_PRIME
            )
            % MINHASH_PRIME
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, band, band_key) LSH banding table — the shared candidate-
    generation substrate for the self-join (minhash_lsh_candidates)
    and the persisted-state incremental path
    (operators/dedup_state.py).

    Band keys project straight off the wide (one-row-per-doc)
    minhash aggregate: md5 over the band's minhashes in seed order —
    byte-identical to hashing the sorted long-format rows, but
    without stacking to num_hashes rows per doc and re-shuffling
    them back together (at 1M docs x 32 hashes that second shuffle
    was 32M rows for zero information gain).
    Indivisible num_hashes/bands leaves a FINAL PARTIAL band of the
    leftover seeds (seed // rows_per_band groups them under band
    index == bands), matching the long-format banding — silently
    dropping those seeds would cost the recall they pay for."""
    rows_per_band = num_hashes // bands
    wide = _minhash_wide(df, id_col, text_col, num_hashes, shingle_size)
    band_seeds = [
        (b, list(range(b * rows_per_band, min((b + 1) * rows_per_band, num_hashes))))
        for b in range(bands + (1 if num_hashes % bands else 0))
    ]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh_{j}").cast("string")
                            for j in seeds
                        ],
                    )
                ).alias("band_key"),
            )
            for b, seeds in band_seeds
        ]
    )
    return wide.select(
        "id", F.explode(band_structs).alias("bk")
    ).select(
        "id",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    Signatures are split into *bands*; documents colliding on an
    entire band's sub-signature become candidates. The all-pairs
    O(n²) comparison becomes an equi-join on (band, band_key) —
    the only shuffle is on bucket keys, which is what makes this
    viable on billions of documents.

    *max_bucket* is the mass-duplication guard: a band bucket holding
    B members emits B(B-1)/2 pairs, so a corpus where 30% of documents
    are byte-identical puts 0.3n members in EVERY band's bucket and
    the join is output-quadratic no matter how it executes — the
    pairs genuinely exist. Buckets larger than *max_bucket* are
    therefore SKIPPED (detected by one combinable count over band
    keys; the oversized-key list is bounded by n*bands/max_bucket
    rows, so the anti-join is left to AQE — broadcast when the list
    is small, which mass duplication guarantees, hash otherwise).
    The semantics argument mirrors the PPJoin document-frequency cap
    (q215) and winnowing's stop-fingerprint cap: members of an
    oversized bucket are overwhelmingly exact/near-exact duplicate
    CLUSTERS, which the exact-dedup tier (dedup_exact /
    duplicate_clusters) identifies for O(n) — a production pipeline
    collapses those first and reserves LSH for the genuinely fuzzy
    tail. Default None preserves exact emit-every-pair semantics."""
    band_keys = minhash_band_keys(
        df, id_col, text_col, num_hashes, bands, shingle_size
    )
    if max_bucket is not None:
        hot = (
            band_keys.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > int(max_bucket))
            .select("band", "band_key")
        )
        band_keys = band_keys.join(
            hot, ["band", "band_key"], "left_anti"
        )
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )


def lsh_tuning(
    spark,
    threshold: float,
    num_hashes: int = 16,
    grid: int = 200,
) -> DataFrame:
    """LSH banding PARAMETER TUNER — the design math behind every
    minhash_lsh_candidates call, run as a plan so it is verifiable:
    for each clean banding geometry (bands b dividing *num_hashes*,
    r = num_hashes/b rows per band), the S-curve
    ``p(s) = 1 - (1 - s^r)^b`` gives the probability a pair with true
    Jaccard s becomes a candidate. The tuner integrates the curve on a
    *grid*-point midpoint rule: false-positive area below *threshold*
    (pairs you will verify and discard), false-negative area above it
    (near-duplicates banding will MISS — the unrecoverable side).

    Returns one row per geometry: (bands, rows_per_band, fp_area,
    fn_area, total_err, best) with areas 6dp-rounded (per-term
    decimal rounding, so the sums are partitioning-independent) and
    ``best`` marking the minimum total error. Cost: |divisors| x grid
    rows — driver-trivial, but expressed as a plan so the DuckDB
    oracle can restate the integration exactly (q236)."""
    from .util import literal_frame

    H = int(num_hashes)
    geoms = [(b, H // b) for b in range(1, H + 1) if H % b == 0]
    g = literal_frame(spark, geoms, "bands int, rows_per_band int")
    pts = spark.range(int(grid)).select(
        ((F.col("id") + 0.5) / F.lit(float(grid))).alias("s")
    )
    p = 1.0 - F.pow(
        1.0 - F.pow(F.col("s"), F.col("rows_per_band")), F.col("bands")
    )
    t = float(threshold)
    dec = lambda c: F.round(c.cast("decimal(30,10)"), 6).cast(  # noqa: E731
        "decimal(30,10)"
    )
    terms = g.crossJoin(pts).select(
        "bands",
        "rows_per_band",
        dec(
            F.when(F.col("s") < t, p / F.lit(float(grid))).otherwise(
                F.lit(0.0)
            )
        ).alias("fp_term"),
        dec(
            F.when(F.col("s") >= t, (1.0 - p) / F.lit(float(grid)))
            .otherwise(F.lit(0.0))
        ).alias("fn_term"),
    )
    agg = terms.groupBy("bands", "rows_per_band").agg(
        F.round(F.sum("fp_term"), 6).cast("double").alias("fp_area"),
        F.round(F.sum("fn_term"), 6).cast("double").alias("fn_area"),
    )
    from pyspark.sql.window import Window

    # |divisors| rows: the unbounded window is a deliberate tiny-frame op
    w = Window.partitionBy()
    return agg.select(
        "bands",
        "rows_per_band",
        "fp_area",
        "fn_area",
        F.round(
            (F.col("fp_area") + F.col("fn_area")).cast("decimal(30,10)"), 6
        )
        .cast("double")
        .alias("total_err"),
    ).withColumn(
        "best",
        F.col("total_err")
        == F.min("total_err").over(w),
    )


# ----------------------------------------------------------------------
# n-gram Jaccard
# ----------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise Jaccard similarity over word n-gram shingle sets,
    for pairs ≥ *threshold*, via PPJoin-style prefix filtering.

    A naive inverted-index self-join generates Σ df(s)² candidate rows
    (quadratic in corpus size for common shingles). Instead, each
    document's shingles are ordered by ascending global document
    frequency and only a short *prefix* (its rarest shingles) is
    joined: two sets with Jaccard ≥ t MUST share at least one prefix
    shingle under a common global order, so candidate generation joins
    only on rare shingles while remaining exact (no false negatives).

    PPJoin refinements (Xiao et al., "Efficient Similarity Joins for
    Near-Duplicate Detection"), both exact:
    - asymmetric prefixes: the pair is generated with the *smaller*
      record (by ``(n, id)`` processing order) on the index side,
      whose prefix only needs ``n - ceil(2t/(1+t)·n) + 1`` shingles
      (vs the probe side's ``n - ceil(t·n) + 1``) — fewer index rows
      ⇒ quadratically fewer candidate collisions on common shingles;
    - length filter: Jaccard ≥ t bounds the size ratio, so the join
      keeps only ``n_index ≥ ceil(t·n_probe)`` pairs before the
      expensive verification.

    Verification computes the true Jaccard on the full shingle arrays
    per surviving candidate pair.

    Returns (id_a, id_b, jaccard).
    """
    from pyspark import StorageLevel

    sh = shingle_table(df, id_col, text_col, shingle_size)
    # global document frequency per shingle: the canonical order that
    # makes prefixes comparable across documents
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    t = float(threshold)
    ordered = (
        sh.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("df", "shingle"))
                ),
                lambda s: s["shingle"],
            ).alias("shingles")
        )
        .withColumn("n_shingles", F.size("shingles"))
        .withColumn(
            "prefix_len",
            F.col("n_shingles")
            - F.ceil(F.col("n_shingles") * F.lit(t)).cast("int")
            + 1,
        )
        .withColumn(
            "index_len",
            F.col("n_shingles")
            - F.ceil(
                F.col("n_shingles") * F.lit(2.0 * t / (1.0 + t))
            ).cast("int")
            + 1,
        )
        # consumed four times (probe + index prefixes, both verify
        # sides); persist so the shingle pipeline runs once, spill-safe
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    probes = ordered.select(
        "id",
        F.col("n_shingles").alias("n"),
        F.explode(F.slice("shingles", 1, F.col("prefix_len"))).alias("shingle"),
    )
    indexed = ordered.select(
        "id",
        F.col("n_shingles").alias("n"),
        F.explode(F.slice("shingles", 1, F.col("index_len"))).alias("shingle"),
    )
    a = probes.alias("a")
    b = indexed.alias("b")
    # index side strictly earlier in (n, id) processing order, and
    # within Jaccard's feasible size ratio
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (
                (F.col("b.n") < F.col("a.n"))
                | (
                    (F.col("b.n") == F.col("a.n"))
                    & (F.col("b.id") < F.col("a.id"))
                )
            )
            & (F.col("b.n") >= F.ceil(F.col("a.n") * F.lit(t))),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
        # candidate pairs are only a few MB after distinct, so AQE
        # coalesces them to ONE partition — which serializes the
        # array_intersect/array_union verification onto one core
        # (measured 7s of a 9s run). An explicit round-robin spread
        # keeps verification parallel; at real scale the distinct
        # output is large and this repartition is a cheap no-op
        # relative to the verify cost it parallelizes.
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    da = ordered.select(
        F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    db = ordered.select(
        F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    # Materialize the verified pairs eagerly (localCheckpoint) so the
    # shingle cache can be released before returning — the same
    # release discipline as the grams edit-join above: without it,
    # repeated PPJoin calls in a long-lived session pin cached shingle
    # partitions until eviction. The checkpoint sits AFTER the Jaccard
    # threshold, so only the (small) surviving pairs are stored.
    out = (
        candidates.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .localCheckpoint()
    )
    ordered.unpersist()
    return out


def _deletion_variants(col: str, d: int):
    """Array column: every string reachable from *col* by at most *d*
    character deletions (the string itself included), duplicates
    removed. Expression-only (whole-stage codegen); empty/short
    strings get the explicit empty-branch guard because Spark's
    sequence(1, 0) runs DESCENDING rather than empty."""
    d1 = (
        f"if(length({col}) >= 1,"
        f" transform(sequence(1, length({col})),"
        f"  i -> concat(substring({col}, 1, i-1), substring({col}, i+1))),"
        f" array())"
    )
    if d == 1:
        return F.expr(f"array_distinct(concat(array({col}), {d1}))")
    # unordered position pairs i < j, both deleted from the original
    d2 = (
        f"if(length({col}) >= 2,"
        f" flatten(transform(sequence(2, length({col})),"
        f"  j -> transform(sequence(1, j-1),"
        f"   i -> concat(substring({col}, 1, i-1),"
        f"              substring({col}, i+1, j-i-1),"
        f"              substring({col}, j+1))))),"
        f" array())"
    )
    return F.expr(f"array_distinct(concat(array({col}), {d1}, {d2}))")


def edit_distance_join(
    a: DataFrame,
    b: DataFrame,
    max_dist: int = 1,
    q: int = 2,
    id_col: str = "id",
    str_col: str = "s",
    strategy: str = "auto",
) -> DataFrame:
    """String-similarity join: all pairs (a, b) with Levenshtein
    distance ≤ *max_dist* — the edit-distance member of the
    similarity-join family next to ``ngram_jaccard_pairs``'s PPJoin.
    The reference's cursor surface has no analogue; this is the
    record-linkage primitive (match dirty names/titles against a
    master list) every large ETL deployment eventually needs.

    Why not a theta join: ``A JOIN B ON levenshtein(...) <= d`` plans
    a BroadcastNestedLoopJoin — |A|×|B| verifications, dead at scale.
    Two exact candidate-pruning strategies instead:

    ``deletes`` (SymSpell/FastSS; default for d ≤ 2): two strings
    within edit distance d share at least one EXACT common string in
    their ≤d-deletion neighbourhoods (align the edit script: delete
    the substituted/deleted chars from one side, the substituted/
    inserted ones from the other — ≤ d deletions each). Candidate
    generation is an equi-join on the variant string, whose key space
    has the full entropy of the strings themselves — it survives even
    the adversarial corpus where a million names share a 9-char stem
    and differ only in a digit tail (measured in SCALE_PROBE.md),
    where ANY gram-based filter degenerates because no gram is rare.
    Cost: 1+L+L(L-1)/2 variants per string at d=2, so this is for
    name/title-length strings; for long strings pass strategy="grams".

    ``grams`` (Ed-Join, Xiao et al. 2008): each string's q-grams are
    occurrence-tagged ((gram, k) for the k-th occurrence, so duplicate
    grams count as multiset overlap) and globally ordered by ascending
    gram document-frequency. One edit destroys at most q gram
    occurrences, so strings within distance d share all but ≤ q·d
    occurrences — among the first q·d+1 occurrences of each string
    (its RAREST grams), at least one is shared. Candidates come from
    an equi-join on (gram, k) over those short prefixes; linear in
    variant-free gram volume, the right trade for LONG strings or
    d > 2, but dependent on gram entropy. Strings too short for the
    theorem (len ≤ q·d+q−1 on both sides) route through an explicit
    length-band equi-join block — exact, and bounded because any
    feasible partner of a short string is itself short.

    Both paths prune |len(a)−len(b)| ≤ d before verification, and
    verification uses Spark's threshold form of levenshtein
    (early-abandon at d+1, JVM codegen).

    Inputs must expose (*id_col*, *str_col*); for a self-join pass the
    same frame twice and keep ``id_a < id_b`` downstream. Returns
    (id_a, id_b, dist), both orientations for a self-join.
    """
    d = int(max_dist)
    if d < 1:
        raise ValueError("max_dist must be >= 1 (use dedup_exact for exact)")
    if strategy == "auto":
        strategy = "deletes" if d <= 2 else "grams"
    if strategy == "deletes" and d > 2:
        raise ValueError(
            "deletes strategy supports max_dist <= 2 "
            "(variant count is O(len^d)); use strategy='grams'"
        )

    from .util import ensure_parallelism

    # single-file scans arrive as ONE partition, which would serialize
    # the variant/gram generation (and any broadcast build over it)
    # onto one core — a straggler at local scale, a no-op re-check at
    # real scale where the scan already has enough partitions
    A = ensure_parallelism(
        a.select(F.col(id_col).alias("id"), F.col(str_col).alias("s")).where(
            F.col(str_col).isNotNull()
        )
    )
    B = ensure_parallelism(
        b.select(F.col(id_col).alias("id"), F.col(str_col).alias("s")).where(
            F.col(str_col).isNotNull()
        )
    )

    if strategy == "deletes":
        va = A.select(
            F.col("id").alias("id_a"),
            F.col("s").alias("s_a"),
            F.explode(_deletion_variants("s", d)).alias("v"),
        )
        vb = B.select(
            F.col("id").alias("id_b"),
            F.col("s").alias("s_b"),
            F.explode(_deletion_variants("s", d)).alias("v"),
        )
        cand = (
            va.join(vb, "v")
            .where(F.abs(F.length("s_a") - F.length("s_b")) <= d)
            .select("id_a", "s_a", "id_b", "s_b")
            .distinct()
        )
        return (
            cand.withColumn("dist", F.levenshtein("s_a", "s_b", d))
            .where((F.col("dist") >= 0) & (F.col("dist") <= d))
            .select("id_a", "id_b", "dist")
        )

    if strategy != "grams":
        raise ValueError(f"unknown strategy: {strategy!r}")

    from pyspark import StorageLevel

    q = int(q)
    small_len = q * d + q - 1  # max length with <= q*d grams
    pref_len = q * d + 1

    u = A.withColumn("side", F.lit("a")).unionByName(
        B.withColumn("side", F.lit("b"))
    )

    # ---- main path: strings with at least one q-gram ----------------
    gram_rows = (
        u.where(F.length("s") >= q)
        .select(
            "side",
            "id",
            "s",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("s") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            ).alias("gram"),
        )
        # k-th occurrence of this gram within the string: duplicate
        # grams match multiset-wise (k aligns with k), keeping the
        # count-filter theorem exact for strings like 'aaaa'
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("side", "id", "gram").orderBy(F.lit(1))
            ),
        )
    )
    dfreq = gram_rows.groupBy("gram").agg(F.count("*").alias("df"))
    prefixes = (
        gram_rows.join(dfreq, "gram")
        .groupBy("side", "id", "s")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("df", "gram", "occ"))),
                1,
                pref_len,
            ).alias("pre")
        )
        # consumed twice (a-side and b-side explode below)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _side(tag: str, suf: str) -> DataFrame:
        return prefixes.where(F.col("side") == tag).select(
            F.col("id").alias(f"id_{suf}"),
            F.col("s").alias(f"s_{suf}"),
            F.explode("pre").alias("p"),
        ).select(
            f"id_{suf}",
            f"s_{suf}",
            F.col("p.gram").alias("gram"),
            F.col("p.occ").alias("occ"),
        )

    cand_main = (
        _side("a", "a")
        .join(_side("b", "b"), ["gram", "occ"])
        .where(
            F.abs(F.length("s_a") - F.length("s_b")) <= d
        )
        .select("id_a", "s_a", "id_b", "s_b")
    )

    # ---- small-string block: len <= q*d+q-1 on both sides -----------
    small_a = A.where(F.length("s") <= small_len)
    small_b = B.where(F.length("s") <= small_len).withColumn(
        "lb", F.length("s")
    )
    cand_small = (
        small_a.select(
            F.col("id").alias("id_a"),
            F.col("s").alias("s_a"),
            F.explode(
                F.sequence(
                    F.greatest(F.length("s") - d, F.lit(0)),
                    F.length("s") + d,
                )
            ).alias("lb"),
        )
        .join(small_b, "lb")
        .select(
            "id_a", "s_a", F.col("id").alias("id_b"), F.col("s").alias("s_b")
        )
    )

    # Materialize the FILTERED result eagerly (localCheckpoint) so the
    # gram-prefix cache can be released before returning: without
    # this, repeated grams-strategy calls in a long-lived session
    # would pin cached prefix partitions until eviction (ADVICE r8).
    # The checkpoint sits AFTER verification, so the pre-verification
    # candidate set — the large intermediate on exactly the long-
    # string corpora this strategy exists for — still streams through
    # the threshold levenshtein in one pass and is never stored.
    cand = cand_main.unionByName(cand_small).distinct()
    out = (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b", d))
        .where((F.col("dist") >= 0) & (F.col("dist") <= d))
        .select("id_a", "id_b", "dist")
        .localCheckpoint()
    )
    prefixes.unpersist()
    return out


# ----------------------------------------------------------------------
# Phonetic blocking (record linkage)
# ----------------------------------------------------------------------
def phonetic_key(col) -> Column:
    """Soundex-style phonetic blocking key, expression-only (whole-
    stage codegen, no UDF): uppercase, strip non-letters, keep the
    first letter verbatim, map the rest to the classic soundex
    consonant classes (B/F/P/V→1, C/G/J/K/Q/S/X/Z→2, D/T→3, L→4,
    M/N→5, R→6, vowels+H/W/Y→0), collapse same-class runs, drop the
    zeros, and keep three class digits zero-padded — so
    Smith/Smyth→S530, Robert/Rupert→R163, Jackson/Jaxon→J250.

    Built from translate + per-digit run-collapse regexps rather than
    a backreference collapse, so the SAME semantics restate in RE2-
    based engines (the DuckDB oracle) where ``(\\d)\\1+`` is
    unsupported. This is the linkage family's recall complement to
    edit_distance_join: a d-bounded join cannot reach Smyth→Smith
    spelling variants at d > max_dist, a phonetic equi-join can —
    compose both as a candidate union (q267)."""
    u = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    coded = F.translate(
        u,
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "01230120022455012623010202",
    )
    for d in "0123456":
        coded = F.regexp_replace(coded, d + "+", d)
    body = F.translate(F.substring(coded, 2, 2147483647), "0", "")
    return F.concat(
        F.substring(u, 1, 1), F.rpad(F.substring(body, 1, 3), 3, "0")
    )


def phonetic_block_join(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    str_col: str = "s",
    max_bucket: int | None = None,
) -> DataFrame:
    """Phonetic candidate pairs: equi-join *a* against *b* on
    ``phonetic_key(str_col)`` — the blocking pass that links
    spelling variants (Smyth/Smith) an edit-distance join cannot
    reach at its distance bound. Returns (id_a, id_b, key).

    At 100 TB this is one hash equi-join on a 4-char key — but
    phonetic keys are Zipfian (S530 holds every Smith), so
    *max_bucket* caps the b-side: keys whose b-side group exceeds the
    cap are DROPPED (the LSH mass-dup-guard convention — a bucket
    that big blocks nothing and would quadratically explode the
    candidate set; pair it with the edit-distance path, which keeps
    full-entropy keys, rather than raising the cap). Compose with
    edit_distance_join via unionByName + distinct on (id_a, id_b)."""
    from .util import ensure_parallelism

    # parallelize the regexp-chain key compute off single-partition
    # scans (see edit_distance_join); no-op when the scan is wide.
    # Project to the two needed columns FIRST so the repartition (when
    # it fires) shuffles (id, str) instead of the full input width
    # (ADVICE r12; matches edit_distance_join's order).
    ka = ensure_parallelism(
        a.select(F.col(id_col).alias("id_a"), F.col(str_col).alias("__s"))
    ).select("id_a", phonetic_key(F.col("__s")).alias("key"))
    kb = ensure_parallelism(
        b.select(F.col(id_col).alias("id_b"), F.col(str_col).alias("__s"))
    ).select("id_b", phonetic_key(F.col("__s")).alias("key"))
    if max_bucket is not None:
        sizes = kb.groupBy("key").agg(F.count("*").alias("__n"))
        kb = kb.join(
            sizes.where(F.col("__n") <= int(max_bucket)).select("key"),
            "key",
            "left_semi",
        )
    return ka.join(kb, "key").select("id_a", "id_b", "key")


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint per document over whitespace tokens.

    Each token votes +1/-1 on each bit of its md5-derived hash; the
    fingerprint takes the sign of each bit's vote sum. Pure
    explode/groupBy — linear scan, one shuffle on (id, bit), then one
    on id. Hamming-close fingerprints ⇒ near-duplicate documents.
    """
    from .util import ensure_parallelism

    tokens = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    # token hash: first 8 hex chars of md5 → 32-bit int (reproducible)
    hashed = tokens.withColumn(
        "th", F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        hashed.select("id", "th", bit)
        .withColumn(
            "vote",
            F.when(F.expr("(th >> bit) & 1") == 1, 1).otherwise(-1),
        )
        .groupBy("id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("id")
        .agg(F.sum("bitval").alias("simhash"))
    )


# ----------------------------------------------------------------------
# embedding cosine near-dup
# ----------------------------------------------------------------------
def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "brute",
    num_planes: int | None = None,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Pairs of rows whose embedding cosine similarity ≥ threshold.

    The default (``method='brute'``) is the exact all-pairs join
    (id_a < id_b) — correct at any threshold, quadratic, never the
    path to run at scale. Exactness is the API default because LSH is
    approximate (docstring below estimates ~0.95+ recall for genuine
    non-identical near-dups); callers opt into the approximation
    explicitly when they accept that tradeoff for scale.

    The scale path (``method='lsh'``) is candidate generation by
    random-hyperplane LSH — both sides hashed into (table, signature)
    buckets, candidates from the bucket equi-join, exact cosine verify
    on candidates only. Shuffle keys are the bucket ids, never all
    pairs, so the plan survives a 100 TB corpus. Bit-identical vectors
    are collapsed to one representative before hashing (see the inline
    comment), so a degenerate corpus region — thousands of copies of
    one vector, which no plane count can split across buckets — costs
    the bucket join one row instead of a quadratic bucket; the
    intra-group pairs are emitted exactly by expansion.

    ``num_planes=None`` (default) sizes the signature from the corpus:
    planes = max(8, ceil(log2(n / 8))), keeping the expected bucket
    around 8 rows so candidate volume stays ~linear
    (num_tables × n × bucket/2) instead of quadratic as the corpus
    grows. Exact duplicates collide in every table at any plane count;
    genuine near-dups at cosine 0.95 collide in ≥1 of 8 tables w.p.
    ≈0.95 at 11 planes — raise ``num_tables`` for more recall, planes
    only trade candidate volume.

    """
    import math

    from .similarity import cosine_similarity
    from .util import ensure_parallelism

    df = ensure_parallelism(df)
    if method == "brute":
        a = df.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        b = df.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(
                    cosine_similarity(F.col("va"), F.col("vb")), 4
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    if method != "lsh":
        raise ValueError(f"unknown method: {method!r}")

    from .similarity import lsh_signatures

    # Exact-duplicate collapse BEFORE hashing: bit-identical vectors
    # are grouped (one linear shuffle on the vector) and only one
    # representative per distinct vector enters the LSH join. Identical
    # vectors share every signature at any plane count, so without this
    # a degenerate corpus region (thousands of copies of one vector)
    # lands in ONE bucket and the bucket join goes quadratic — raising
    # num_planes cannot split it. With the collapse, the join sees one
    # row per distinct vector; the (inherently quadratic) intra-group
    # pair OUTPUT is generated by explode expansion, never by a join.
    groups = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .groupBy("v")
        .agg(F.sort_array(F.collect_list("id")).alias("members"))
    )
    if num_planes is None:
        # one cheap count to size the signature; at a known scale pass
        # num_planes explicitly and skip the extra job
        n = groups.count()
        num_planes = max(8, math.ceil(math.log2(max(n, 2) / 8)))

    # intra-group pairs: exact duplicates by construction — cosine
    # computed once per group (same kernel, identical value), carried
    # through the pair expansion
    intra = (
        groups.where(F.size("members") >= 2)
        .select(
            "members",
            F.round(cosine_similarity(F.col("v"), F.col("v")), 4).alias(
                "cosine"
            ),
            F.posexplode("members").alias("pos", "id_a"),
        )
        .select(
            "id_a",
            F.explode(
                F.slice("members", F.col("pos") + F.lit(2), F.size("members"))
            ).alias("id_b"),
            "cosine",
        )
        .select("id_a", "id_b", "cosine")
        .where(F.col("cosine") >= threshold)
    )

    reps = groups.select(
        F.element_at("members", 1).alias("rid"), "v", "members"
    )
    sig_kernel = lsh_signatures(num_tables, num_planes, dim)

    def bucketed(side: DataFrame, vec: str, sig_alias: str) -> DataFrame:
        # every table's signature from ONE Arrow-batched matmul,
        # then one (table, sig) row per hash table — static explode
        withs = side.withColumn(sig_alias, sig_kernel(F.col(vec)))
        return withs.select(
            "*", F.posexplode(sig_alias).alias("tbl", "sig")
        )

    a = reps.select(
        F.col("rid").alias("rid_a"),
        F.col("v").alias("va"),
        F.col("members").alias("ma"),
    )
    b = reps.select(
        F.col("rid").alias("rid_b"),
        F.col("v").alias("vb"),
        F.col("members").alias("mb"),
    )
    # first-collision-wins dedup: a pair is kept only in the
    # EARLIEST table where the two signatures collide — a pure
    # codegen filter over the carried signature arrays, so no
    # dedup shuffle/sort ever materializes the duplicate pairs
    earlier_collision = F.expr(
        "exists(zip_with(slice(sigs_a, 1, tbl), slice(sigs_b, 1, tbl),"
        " (x, y) -> x = y), c -> c)"
    )
    cand = (
        bucketed(a, "va", "sigs_a")
        .join(bucketed(b, "vb", "sigs_b"), ["tbl", "sig"])
        .where(F.col("rid_a") < F.col("rid_b"))
        .where(~earlier_collision)
        .select(
            "ma",
            "mb",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 4).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )
    # cross-group near-dup pairs: verified once per representative
    # pair, then expanded to every member combination
    cross = (
        cand.select(F.explode("ma").alias("ea"), "mb", "cosine")
        .select("ea", F.explode("mb").alias("eb"), "cosine")
        .select(
            F.least("ea", "eb").alias("id_a"),
            F.greatest("ea", "eb").alias("id_b"),
            "cosine",
        )
    )
    return intra.unionAll(cross)


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Group near-duplicate PAIRS into CLUSTERS via distributed
    connected components (iterative min-label propagation).

    Pair generators (MinHash LSH, PPJoin) emit edges; survivor
    selection needs components — A~B and B~C must put A,B,C in ONE
    cluster even though (A,C) was never emitted. Labels start as each
    node's own id; each round every node takes the min of its label
    and its neighbors' labels (one shuffle per round: edge-label join
    + min-aggregate). Converges in O(log(diameter)) rounds — dup
    clusters are near-cliques, so 2-3 rounds in practice; driver only
    ever sees the 1-row convergence count, never the data.
    localCheckpoint() truncates the growing lineage each round (the
    standard iterative-algorithm hygiene on Spark).

    Returns (node_id, cluster_id) for every node appearing in pairs,
    cluster_id = min node id of the component.
    """
    # both edge directions from ONE pass over pairs — a union of two
    # selects would evaluate the (expensive) pair-generation subtree
    # twice, since nothing upstream is materialized yet
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # lazy: materializes inside round 1's (eager) checkpoint job —
        # a separate edges job per call carried no information
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Observation

    if max_iterations <= 0:
        return edges.select(
            F.col("src").alias("node_id"),
            F.col("src").alias("cluster_id"),
        ).distinct()
    # ROUND 1 FOLDED INTO THE LABEL INIT: the initial label IS the
    # node id, so the first round's edge⋈label join is a join against
    # an identity table — neighbor-min is just min(dst) per src. One
    # aggregate replaces the separate label-init checkpoint job plus
    # round 1's join, and emits the identical labels (min of self and
    # all direct neighbors) with the identical changed count.
    obs = Observation()
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_label"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nbr_label")).alias("label"),
        )
        .observe(
            obs,
            F.count(
                F.when(F.col("label") != F.col("node"), F.lit(1))
            ).alias("changed"),
        )
        .localCheckpoint()
    )
    if int(obs.get["changed"]) == 0:
        return labels.select(
            F.col("node").alias("node_id"),
            F.col("label").alias("cluster_id"),
        )
    for _ in range(max_iterations - 1):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "dst_node"),
                edges.dst == F.col("dst_node"),
            )
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # convergence check piggybacks on the checkpoint job via
        # observe(): the old label rides the round's projection and
        # the changed-row count fills during the SAME action that
        # materializes the round — the separate join+count job the
        # previous shape paid per round is gone
        obs = Observation()
        new_labels = (
            labels.join(
                neighbor_min, labels.node == neighbor_min.src, "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                F.col("label").alias("__old"),
            )
            .observe(
                obs,
                F.count(
                    F.when(F.col("label") != F.col("__old"), F.lit(1))
                ).alias("changed"),
            )
            .select("node", "label")
            .localCheckpoint()
        )
        changed = int(obs.get["changed"])
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("node_id"), F.col("label").alias("cluster_id")
    )


def select_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    quality_col: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Pick ONE survivor per duplicate cluster and map every clustered
    document to it — the final step of the dedup pipeline (pairs →
    clusters → survivors → filtered corpus).

    Policy: highest ``quality_col`` wins (default:
    text.quality_score over ``text_col``), ties broken by smallest id
    so the choice is deterministic across runs and engines. One
    window over cluster_id — the per-cluster ranking shuffles only the
    CLUSTERED docs (a tiny fraction of a 100 TB corpus), never the
    full table; the kept/dropped verdict then joins back to the corpus
    on id (broadcastable when dup rate is low, reference parity:
    etlhelper's transform-then-load filtering, etlhelper/etl.py).

    Returns (id, cluster_id, quality, survivor_id, kept) for every
    document that appears in ``clusters``.
    """
    from .text import quality_score

    if quality_col is None:
        quality_col = quality_score(F.col(text_col))
    scored = clusters.join(
        docs, clusters.node_id == docs[id_col]
    ).select(
        docs[id_col].alias("id"),
        "cluster_id",
        quality_col.alias("quality"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("id").asc()
    )
    return scored.select(
        "id",
        "cluster_id",
        "quality",
        F.first("id").over(w).alias("survivor_id"),
    ).withColumn("kept", F.col("id") == F.col("survivor_id"))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iterations: int = 2,
    threshold: float = 0.3,
    assignments: DataFrame | None = None,
    target_cluster_size: int = 256,
    max_cluster: int | None = 4096,
    n: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding corpus with k-means,
    then run EXACT pairwise cosine only WITHIN each cluster and drop
    the higher-id member of every pair above *threshold*.

    Scale contract — the two knobs that keep the within-cluster work
    O(n · target_cluster_size) instead of quadratic:

    - ``k`` defaults to ``max(8, ceil(n / target_cluster_size))`` so
      the EXPECTED cluster size stays fixed as the corpus grows (at
      fixed k the within-cluster compare work O(Σ cᵢ²) is quadratic in
      n). ``n`` is taken from a parquet-metadata count when not passed
      by the caller.
    - ``max_cluster`` bounds the WORST CASE: a cluster larger than it
      (skewed seeds, near-duplicate-heavy corpora) is re-sharded into
      ``ceil(c / max_cluster)`` deterministic salted sub-shards
      (xxhash64 of the id) and pairs are generated within sub-shards
      only — the same degenerate-bucket cap lsh_bucket_topk applies
      via ``max_bucket``, and like it this trades bounded recall
      (cross-shard pairs of an OVERSIZED cluster are skipped; clusters
      within the cap are exhaustive and exact) for a hard per-task
      ceiling. ``max_cluster=None`` disables the cap.

    The pairwise stage runs as one numpy matmul per (cluster, shard)
    group inside applyInPandas — the Arrow-batched kernel move made
    for lsh_signatures — in row blocks so peak memory is
    O(block × max_cluster), emitting only pairs whose RAW cosine
    clears ``threshold`` minus a 1e-3 guard band. The declared sim is
    then computed JVM-side from the emitted dot product and the
    once-per-vector norms with the corpus-wide contract:
    round(coalesce(try_divide(dot, na*nb), -1.0) :: decimal(30,10), 4)
    — zero-norm vectors score -1.0 exactly like cosine_similarity, and
    the 4dp guard band is ~20× the largest shift rounding can induce,
    so the survivor set equals the unfiltered computation's.

    Returns (cluster_id, id_a, id_b, sim) pairs with id_a < id_b and
    sim >= threshold; the caller drops id_b (keep-first policy) or
    feeds the pairs to duplicate_clusters for transitive clustering.

    *assignments* (columns id, cluster_id) lets a caller inject a
    cached/persisted clustering so the Lloyd rounds don't rerun per
    consumer — the production shape, where clustering is a shared
    upstream stage (build it with a k compatible with this one).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    from .clustering import kmeans_assignments
    from .similarity import _norm

    if k is None:
        if n is None:
            n = df.count()
        k = max(8, math.ceil(n / target_cluster_size))

    assigned = (
        assignments
        if assignments is not None
        else kmeans_assignments(df, id_col, vec_col, k, iterations)
    )
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    # Norms are computed ONCE per vector here, not once per pair, and
    # ride through the pairwise stage so the final sim is one division
    # per emitted pair.
    members = (
        assigned.select("id", "cluster_id")
        .join(vecs, "id")
        .select("id", "cluster_id", "vec", _norm(F.col("vec")).alias("nrm"))
    )
    if max_cluster is not None:
        # worst-case cap: the size aggregate is |clusters| rows
        # (map-side combinable; |clusters| ≈ n/target_cluster_size, so
        # ~4M rows / tens of MB even at 10^9 vectors — comfortably
        # broadcastable) and joins back as a broadcast; in-cap
        # clusters keep shard 0 so the common path is untouched.
        # Sizes come from the ASSIGNMENTS frame alone — counting per
        # cluster needs no vectors, so the assignments⋈vectors join
        # (the corpus-sized work) runs exactly once, for the pairwise
        # input, not twice.
        sizes = assigned.groupBy("cluster_id").agg(
            F.count("*").alias("__csz")
        )
        members = (
            members.join(F.broadcast(sizes), "cluster_id")
            .withColumn(
                "shard",
                F.when(F.col("__csz") <= max_cluster, F.lit(0)).otherwise(
                    F.pmod(
                        F.xxhash64("id"),
                        F.ceil(F.col("__csz") / max_cluster).cast("int"),
                    ).cast("int")
                ),
            )
            .drop("__csz")
        )
    else:
        members = members.withColumn("shard", F.lit(0))

    # raw-cosine guard band: JVM-side rounding moves a sim by at most
    # 5.0001e-5 (4dp half-up through a 10dp decimal), so any pair whose
    # ROUNDED sim can reach threshold has raw >= threshold - 1e-3.
    pre = float(threshold) - 1e-3

    id_type = members.schema["id"].dataType
    cid_type = members.schema["cluster_id"].dataType
    out_schema = StructType(
        [
            StructField("cluster_id", cid_type),
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("dot", DoubleType()),
            StructField("na", DoubleType()),
            StructField("nb", DoubleType()),
        ]
    )
    empty = {
        "cluster_id": pd.Series([], dtype=object),
        "id_a": pd.Series([], dtype=object),
        "id_b": pd.Series([], dtype=object),
        "dot": pd.Series([], dtype="float64"),
        "na": pd.Series([], dtype="float64"),
        "nb": pd.Series([], dtype="float64"),
    }

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(empty)
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        M = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        ids = pdf["id"].to_numpy()
        cid = pdf["cluster_id"].iloc[0]
        cols = np.arange(m)[None, :]
        out: list[pd.DataFrame] = []
        # row blocks bound peak memory at O(block × m) regardless of
        # cluster size (m itself is bounded by max_cluster + skew of
        # the salted split)
        block = 1024
        for s in range(0, m, block):
            e = min(s + block, m)
            D = M[s:e] @ M.T  # (b, m) dot products
            P = nrm[s:e, None] * nrm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                R = np.where(P > 0.0, D / P, -1.0)
            mask = (cols > np.arange(s, e)[:, None]) & (R >= pre)
            ai, bj = np.nonzero(mask)
            if len(ai):
                out.append(
                    pd.DataFrame(
                        {
                            "cluster_id": cid,
                            "id_a": ids[ai + s],
                            "id_b": ids[bj],
                            "dot": D[ai, bj],
                            "na": nrm[ai + s],
                            "nb": nrm[bj],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)

    pairs = members.groupBy("cluster_id", "shard").applyInPandas(
        cluster_pairs, out_schema
    )
    sim = F.round(
        F.coalesce(
            F.try_divide(F.col("dot"), F.col("na") * F.col("nb")),
            F.lit(-1.0),
        ).cast("decimal(30,10)"),
        4,
    ).cast("double")
    return (
        pairs.select("cluster_id", "id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )
