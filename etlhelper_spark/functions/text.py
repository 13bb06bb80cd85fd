"""Text analysis operators for large-scale corpus pipelines.

Every function here is a pure pyspark.sql.functions expression —
JVM-side, vectorized, whole-stage-codegen friendly — so it scales
linearly over 100 TB of documents with zero Python in the hot path.
Each has an exact ANSI/DuckDB-SQL equivalent used by the correctness
oracle (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: marker words per language for the n-gram/stopword heuristic;
#: chosen to be expressible identically in any SQL dialect via
#: occurrence counting on ' word ' with spaces.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "y"],
}


def _occurrences(col: Column, word: str) -> Column:
    """Count occurrences of ' word ' via length arithmetic (identical
    semantics in Spark and any SQL engine)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, needle, "")))
        / len(needle)
    ).cast("int")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    puncts = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return puncts / F.greatest(F.length(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards reasonable length,
    penalizes punctuation-noise. Deterministic, SQL-expressible."""
    length_term = F.least(token_count(col) / F.lit(50.0), F.lit(1.0))
    return F.round(length_term * (F.lit(1.0) - punct_ratio(col)), 4)


def language_id(col: Column) -> Column:
    """Marker-word language guess over LANG_MARKERS; 'und' when no
    marker matches. Ties broken by fixed language order via greatest."""
    scores = {
        lang: sum(
            (_occurrences(col, w) for w in words), F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed so earlier languages win ties (CASE evaluates in order)
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(result)


def document_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed
    text. md5 is reproducible across engines, unlike engine-native
    hash() functions."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, tokens, avg token length, punct
    ratio, quality score, fingerprint, language guess."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(c, r"\s+", ""))
            / F.greatest(token_count(c), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        document_fingerprint(c).alias("fingerprint"),
        language_id(c).alias("lang_guess"),
    )


def top_tokens(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Global top-k tokens by frequency (tie-broken by token text).

    explode -> partial-aggregated groupBy (map-side combine is
    automatic) -> top-k. At 100 TB the groupBy shuffles only one row
    per distinct token per partition.
    """
    from .util import ensure_parallelism

    return (
        ensure_parallelism(df)
        .select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "token"
            )
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


# (pattern, replacement) pairs applied in order by redact_pii.  RE2- and
# Java-regex-compatible (no lookbehind) so the same patterns run in
# Spark, DuckDB, and most scrubbing tools.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Scrub emails / IPv4s / phone-ish number runs, JVM-side.

    A chain of ``regexp_replace`` expressions — stays inside
    whole-stage codegen, no Python worker, so it runs at full scan
    speed over a 100 TB corpus (the pre-training PII-scrub pass).
    Order matters: emails before phones so digits inside an address
    are consumed as <EMAIL>, IPs before phones so dotted quads don't
    half-match the looser phone run.
    """
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> Column:
    """Struct of per-category PII match counts (emails, ips, phones) —
    the audit metric emitted alongside redaction."""
    return F.struct(
        F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[0][0]), F.lit(0))).alias("emails"),
        F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[1][0]), F.lit(0))).alias("ips"),
        F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[2][0]), F.lit(0))).alias("phones"),
    )


def unigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean token surprisal under the corpus unigram
    distribution — the cheap end of perplexity-based quality filtering
    (the LM-scoring step of a web-corpus pipeline, without the LM):
    documents whose tokens are systematically rare score high and get
    routed to review/drop.

    Distributed shape: one explode + token-frequency aggregate
    (map-side combinable), the corpus total as a 1-row broadcast, one
    re-join on token, one per-doc aggregate. Everything is built-in
    expressions — linear in corpus size, no vocabulary ever sits on
    the driver.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            (-F.log2(F.col("c").cast("double") / F.col("n_total"))).alias(
                "surprisal"
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("surprisal").cast("decimal(30,10)"), 4)
        .cast("double")
        .alias("mean_surprisal"),
    )


def winnow_fingerprints(
    col: Column, k: int = 8, w: int = 4, hash_fn: str = "md5"
) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-char shingle, then
    keep the minimum hash of each sliding window of *w* consecutive
    shingle hashes, deduplicated. Guarantees any shared substring of
    length >= k + w - 1 contributes at least one shared fingerprint,
    which is what makes it the standard local-fingerprint scheme for
    plagiarism / near-dup detection over code and text corpora.

    Built entirely from higher-order array functions (``transform`` /
    ``slice`` / ``array_min`` / ``array_distinct``) over md5 shingle
    hashes — single codegen'd projection, no explode, no shuffle, no
    Python: at 100 TB this runs at scan speed and emits a bounded
    array (<= n_shingles / w expected fingerprints per doc). md5 (not
    engine-native ``hash``) keeps the fingerprints reproducible across
    engines, so the DuckDB oracle computes the identical set.

    Short inputs degrade gracefully: fewer than w shingles -> one
    window over all shingles; fewer than k chars -> empty array.
    """
    n_grams = F.length(col) - F.lit(k - 1)
    if hash_fn == "md5":
        # cross-engine reproducible (the DuckDB oracle computes the
        # identical set) — the default, and the slow path: md5 costs
        # ~75k docs/s/32 cores at 50-char docs (SCALE_PROBE.md)
        def shingle_hash(i):
            return F.substring(F.md5(F.substring(col, i, k)), 1, 8)

    elif hash_fn == "xxhash64":
        # production scan path: JVM xxhash64 intrinsic, no md5 bignum —
        # same winnowing guarantees (any consistent hash works), NOT
        # comparable across engines; zero-padded hex keeps min() order
        # equivalent to numeric order
        def shingle_hash(i):
            return F.lpad(
                F.hex(F.xxhash64(F.substring(col, i, k))), 16, "0"
            )

    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    hashes = F.transform(
        F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
            F.array().cast("array<int>")
        ),
        shingle_hash,
    )

    def _winnow(h):
        # h is a lambda VARIABLE bound to the evaluated hash array —
        # referencing it is free. Referencing the `hashes` expression
        # tree here instead would inline (and re-evaluate) the full
        # md5 map once PER WINDOW, turning the per-row cost from
        # O(n·w) into O(n²) — measured 15× slower at 300-char docs.
        n_windows = F.greatest(F.size(h) - F.lit(w - 1), F.lit(1))
        wins = F.transform(
            F.when(F.size(h) >= 1, F.sequence(F.lit(1), n_windows))
            .otherwise(F.array().cast("array<int>")),
            lambda i: F.array_min(F.slice(h, i, w)),
        )
        return F.array_sort(F.array_distinct(wins))

    # array(hashes) -> transform -> element_at(.., 1) is a let-binding:
    # the hash array is computed once per row and shared.
    return F.element_at(F.transform(F.array(hashes), _winnow), 1)


def quality_logit(col: Column) -> Column:
    """Deterministic quality-classifier score in [0, 1]: a fixed-weight
    logistic model over cheap per-document features (log length, token
    diversity, punctuation ratio, mean token length) — the shape of a
    fastText/linear quality filter (CCNet, DCLM) with the learned
    weights replaced by published-heuristic constants so the score is
    reproducible without a model artifact.

    Pure codegen expression chain (log/exp/length arithmetic): scores
    a 100 TB corpus at scan speed; thresholding happens downstream so
    the same scan serves routing, reporting, and mixture weighting.
    """
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    diversity = F.size(F.array_distinct(toks)) / n_tok
    mean_tok_len = F.length(F.regexp_replace(col, r"\s+", "")) / n_tok
    z = (
        F.lit(-3.0)
        + F.lit(0.45) * F.log(F.greatest(F.length(col), F.lit(1)).cast("double"))
        + F.lit(2.0) * diversity
        - F.lit(4.0) * punct_ratio(col)
        - F.lit(0.05) * mean_tok_len
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def tokens_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) exploded table under THE tokenization rule
    (lower → trim → split on whitespace → drop empties) that links the
    inverted index to every ranking/statistics layer built on it —
    one definition so the index and its consumers can never diverge."""
    from .util import ensure_parallelism

    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
    )

def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """Byte-pair-encoding MERGE TRAINING over a corpus — the first
    *rounds* merge rules of the tokenizer-induction loop (learn the
    most frequent adjacent symbol pair, fuse it everywhere, repeat),
    the iterative companion to q101's token accounting.

    Spark-first decomposition, all on the DISTINCT-WORD table (the
    standard BPE trick: corpus scale enters only through word
    frequencies, so the iteration runs over |vocabulary| rows):

    - pair counts: zip_with(s[:-1], s[1:]) -> explode -> one
      combinable groupBy per round (the only shuffle; |symbol pairs|
      keys);
    - the winning pair (max count, ties lexical a-then-b) collects to
      the driver — one row per round, bounded by *rounds*;
    - merge application is a pure codegen array pass per word:
      position i fuses when (s[i], s[i+1]) equals the winner, and
      position i+1 drops when its predecessor fused. Self-pairs
      (a = b) are EXCLUDED from candidates, which makes fuses
      provably non-overlapping — greedy-leftmost equals
      all-at-once, so one indexed transform implements the merge
      exactly (no sequential scan; different BPE implementations
      disagree on overlapping self-pair semantics, so the contract
      pins the unambiguous case).

    At 10^7-word vocabularies each round is one explode + one
    combinable aggregate + one array map — linear, shuffle-bounded by
    the pair-count aggregation. Returns (step, left, right, cnt):
    the learned merges in order with their weighted pair counts.

    The loop is CHECKPOINTED per round (the bpe_word_encodings /
    duplicate_clusters discipline): without the cut, round N's lazy
    plan re-derives the corpus-scale word aggregation and rounds
    1..N-1's fuses from scratch — quadratic recompute that made
    64-merge training infeasible. The winning pair collects to the
    driver (ONE row per round, bounded by *rounds* — it IS the
    tokenizer artifact, the same bounded-driver contract as
    codebooks/pivots), which buys early-stop detection on a fully
    fused vocabulary and a pure-literal fuse with no crossJoin.
    """
    from .util import literal_frame

    w = _bpe_word_table(df, text_col).select("freq", F.col("s"))
    merges, _ = _bpe_train_loop(w, rounds, ["freq"])
    return literal_frame(
        df.sparkSession,
        merges,
        "step int, left string, right string, cnt long",
    )


def _bpe_train_loop(
    w: DataFrame, rounds: int, carry: list[str]
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The shared checkpointed BPE training loop over a prepared word
    table: per round, ONE combinable pair-count aggregate over the
    materialized |vocab| rows, a one-row driver collect of the winner
    (bounded by *rounds*), and a pure-literal codegen fuse. Stops
    early when no eligible pair remains (every word fused to a single
    symbol / only self-pairs left) — at realistic merge counts on
    small vocabularies the rule budget can outlive the corpus.

    Returns (merges, final_w): the ordered (step, left, right, cnt)
    rules and the word table AFTER every learned fuse (checkpointed,
    so downstream consumers touch only |vocab| materialized rows).

    Checkpoints are LAZY (eager=False): the next round's winner
    collect forces materialization anyway, so an eager checkpoint
    would double the per-round job count — at 64+ rounds the loop is
    job-overhead-bound, and halving jobs roughly halves wall-clock."""
    w = w.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, rounds + 1):
        top = _bpe_top_pair(w).collect()
        if not top:
            break
        r = top[0]
        merges.append((step, r["a"], r["b"], int(r["cnt"])))
        w = _bpe_fuse_literal(w, r["a"], r["b"], carry).localCheckpoint(
            eager=False
        )
    return merges, w


def _bpe_word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(w, freq, s): distinct words with corpus frequency and the
    character-level symbol array the merge loop rewrites."""
    return (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            "freq",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ).alias("s"),
        )
    )


def _bpe_top_pair(w: DataFrame) -> DataFrame:
    """ONE-ROW frame (a, b, cnt): the frequency-weighted winning
    adjacent pair (ties lexical a-then-b), self-pairs excluded."""
    return (
        w.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("s", 1, F.size("s") - 1),
                    F.slice("s", 2, F.size("s") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        .select("freq", "p.a", "p.b")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
    )


def _fused_symbols(ma: Column, mb: Column) -> Column:
    """The fused symbol array for one merge rule (ma, mb), as a pure
    codegen indexed pass over ``s``: position i fuses when
    (s[i], s[i+1]) equals the rule; position i+1 drops when its
    predecessor fused (non-overlapping because self-pairs are
    excluded from candidates)."""

    def fuse(x, i):
        nxt = F.try_element_at(F.col("s"), i + F.lit(2))
        # element_at index 0 is invalid even for try_element_at;
        # the when() guard keeps i=0 (no predecessor) off that path
        prev = F.when(
            i > F.lit(0), F.try_element_at(F.col("s"), i)
        ).otherwise(F.lit(None).cast("string"))
        return F.struct(
            F.when(
                (x == ma) & (nxt == mb),
                F.concat(x, mb),
            )
            .otherwise(x)
            .alias("sym"),
            (
                F.coalesce(prev == ma, F.lit(False)) & (x == mb)
            ).alias("dropped"),
        )

    return F.transform(
        F.filter(
            F.transform(F.col("s"), fuse),
            lambda t: ~t["dropped"],
        ),
        lambda t: t["sym"],
    )


def _bpe_fuse_literal(
    w: DataFrame, a: str, b: str, carry: list[str]
) -> DataFrame:
    """Apply one FROZEN merge rule known driver-side (a persisted
    tokenizer's rule table) as pure literals — no crossJoin, no
    broadcast, so a chain of rules stays one codegen projection."""
    return w.select(
        *carry, _fused_symbols(F.lit(a), F.lit(b)).alias("s")
    )


def bpe_word_encodings(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """BPE ENCODING of the distinct-word table under *rounds* merge
    rules trained on the same corpus — the tokenizer-APPLICATION half
    of bpe_merges (which only returns the learned rules). Runs the
    identical training loop (same winner selection, same fuse
    contract) but ALSO applies the final round's merge, then returns
    (w, n_sub): each distinct word with its subword-token count under
    the learned vocabulary. Encoding happens once per DISTINCT word —
    corpus scale enters only through the later word-level join, so at
    a 10^7-word vocabulary this is `rounds` explode+aggregate+map
    passes over |vocabulary| rows, never |corpus|.

    The vocabulary table is localCheckpoint-ed once up front and after
    every fuse: without the cut, round N's lazy plan re-derives the
    corpus-scale word aggregation and rounds 1..N-1's fuses from
    scratch (quadratic recompute — the q37 label-propagation lesson);
    with it, each round touches only the materialized |vocab| rows.
    Measured 3.0s -> ~1s at sf0.1."""
    w = _bpe_word_table(df, text_col)
    _, wf = _bpe_train_loop(w, rounds, ["w", "freq"])
    return wf.select("w", F.size("s").alias("n_sub"))


def bpe_doc_token_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = 3,
    merges: list | None = None,
    vocab: DataFrame | None = None,
    unk_id: int | None = None,
) -> DataFrame:
    """TOKEN-ID SEQUENCES per document under a BPE vocabulary — the
    encode step of the packed-tensor export (functions/packing.py::
    pack_token_windows consumes this): returns
    ``(<id_col>, token_ids array<long>, n_tokens)`` where
    ``token_ids`` is the document's subword ids in reading order.

    *merges* is an optional FROZEN driver-side rule list (rows with
    ``left``/``right`` — operators/bpe_state.py::read_bpe_merges's
    shape), replayed as pure literal fuses with the apply_bpe_state
    chain-cut discipline; omitted, the rules are trained in-engine on
    *df* itself (bpe_word_encodings's loop), which is what the q279
    oracle restates. Token ids are dense ranks of the SORTED distinct
    subword vocabulary — deterministic across runs, partitionings,
    and engines (binary string order both sides). A production flow
    freezes merges AND vocab together; the id assignment here is the
    deterministic in-corpus instance of that contract.

    Distributed shape: encoding runs once per DISTINCT word (the
    bpe_word_encodings argument — corpus scale enters only through
    the word-keyed join), the vocabulary id rank is a single-partition
    window over |vocab| rows (bounded by the vocabulary, never the
    corpus), and the per-document flatten is one hash aggregate whose
    list is bounded by document length. The token arrays ship exactly
    once, into that aggregate.

    *vocab* optionally supplies a FROZEN (sym, tok_id) table
    (operators/bpe_state.py::read_bpe_vocab) instead of deriving ids
    from this corpus's own subword set — the vintage-stability half
    of the tokenizer contract: without it, a later batch that adds or
    loses one subword silently renumbers EVERY id, and persisted
    tensors from different vintages stop being comparable. Subwords
    absent from the frozen vocab map to *unk_id* when given, else
    fail loudly from the executor (silent unk-substitution is a
    modeling decision the caller must opt into). Pass *merges* from
    the same frozen state so boundaries and ids share a vintage."""
    from pyspark.sql.window import Window

    w = _bpe_word_table(df, text_col)
    if merges is None:
        _, wf = _bpe_train_loop(w, rounds, ["w", "freq"])
    else:
        wf = w
        for i, r in enumerate(merges):
            wf = _bpe_fuse_literal(wf, r["left"], r["right"], ["w", "freq"])
            if (i + 1) % 8 == 0 and (i + 1) < len(merges):
                wf = wf.localCheckpoint(eager=False)
    # reused twice below (vocab + word encodings): cut once
    wf = wf.select("w", "s").localCheckpoint(eager=False)
    if vocab is None:
        vocab_ids = (
            wf.select(F.explode("s").alias("sym"))
            .distinct()
            .select(
                "sym",
                (F.row_number().over(Window.orderBy("sym")) - 1)
                .cast("long")
                .alias("tok_id"),
            )
        )
        sym_join, id_expr = "inner", F.col("tok_id")
    else:
        vocab_ids = vocab.select(
            "sym", F.col("tok_id").cast("long").alias("tok_id")
        )
        if unk_id is not None:
            sym_join = "left"
            id_expr = F.coalesce(
                F.col("tok_id"), F.lit(int(unk_id)).cast("long")
            )
        else:
            sym_join = "left"
            id_expr = F.coalesce(
                F.col("tok_id"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "bpe_doc_token_ids: subword not in the "
                            "frozen vocab: "
                        ),
                        F.col("sym"),
                        F.lit(
                            " — pass unk_id to opt into unk "
                            "substitution, or retrain the vocab"
                        ),
                    )
                ).cast("long"),
            )
    wid = (
        wf.select("w", F.posexplode("s").alias("spos", "sym"))
        .join(vocab_ids, "sym", sym_join)
        .withColumn("tok_id", id_expr)
        .groupBy("w")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("spos", "tok_id"))
            ).alias("__p")
        )
        .select("w", F.col("__p").getField("tok_id").alias("__wids"))
    )
    words = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("wpos", "w"),
        )
        .where(F.col("w") != "")
    )
    return (
        words.join(wid, "w")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("wpos"), F.col("__wids").alias("t"))
                )
            ).alias("__d")
        )
        .select(
            id_col,
            F.flatten(F.col("__d").getField("t")).alias("token_ids"),
        )
        .withColumn("n_tokens", F.size("token_ids").cast("long"))
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word *n*-grams of a token array; empty
    array when the document has fewer than *n* tokens.

    Built by zip_with over LITERALLY-shifted slices (the q213 bigram
    trick generalized): each of the n-1 zips is one linear codegen
    pass, so the whole gram array costs O(n_tokens * n). The obvious
    transform(sequence)+slice(i)+array_join form evaluates a
    non-literal slice per element — O(n_tokens^2) interpreted, and
    measured 18x slower at bench scale (12.7s -> 0.7s for q271)."""
    g = toks
    for k in range(1, n):
        # length = size(toks): clips to the tail; an INT_MAX literal
        # overflows inside zip_with's slice evaluation (all-null out)
        g = F.zip_with(
            g,
            F.slice(toks, k + 1, F.size(toks)),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    # zip_with pads to the longer side with nulls, and concat
    # null-propagates — the last n-1 entries are null, sliced away
    return F.when(
        F.size(toks) >= n, F.slice(g, 1, F.size(toks) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<string>"))


def _gram_run_stats(toks: Column, n: int) -> Column:
    """Per-document n-gram frequency statistics as ONE array
    expression: struct(top_cnt, top_gram, dup_cnt, dup_chars).

    Shape: sort the gram array, find run boundaries (indexed
    transform + filter), turn boundary gaps into run lengths
    (zip_with against the shifted boundary list), then take the max
    (run, start) struct — because the grams are sorted ascending,
    equal-count ties resolve to the greatest start index = the
    lexicographically greatest gram, exactly the documented
    deterministic tie-break. Duplicated-gram count/character-mass are
    a filter and a fold over the same (start, run) pairs. Everything
    stays inside one codegen projection: no explode, no aggregate, no
    shuffle — at 100 TB this is a pure map over the corpus scan (the
    chunker's scale shape), vs the explode + two-hash-aggregate form
    which shuffles O(corpus tokens) rows twice (measured 10x slower
    at bench scale)."""
    s = F.array_sort(_word_ngrams(toks, n))
    m = F.size(s)
    starts = F.filter(
        F.transform(
            s,
            lambda x, i: F.when(i == 0, i).otherwise(
                F.when(x != F.element_at(s, i), i)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    ends = F.concat(
        F.slice(starts, 2, F.size(starts)), F.array(m)
    )
    # (run_length, start_index) per distinct gram, struct-ordered so
    # array_max = (max count, then max start = greatest gram)
    pairs = F.zip_with(
        starts,
        ends,
        lambda a, b: F.struct((b - a).alias("r"), a.alias("a")),
    )
    top = F.array_max(pairs)
    top_gram = F.element_at(s, top["a"] + F.lit(1))
    dup = F.filter(pairs, lambda p: p["r"] >= 2)
    dup_chars = F.aggregate(
        dup,
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + p["r"].cast("long")
        * F.length(F.element_at(s, p["a"] + F.lit(1))),
    )
    empty = F.struct(
        F.lit(0).cast("long").alias("top_cnt"),
        F.lit("").alias("top_gram"),
        F.lit(0).cast("long").alias("dup_cnt"),
        F.lit(0).cast("long").alias("dup_chars"),
    )
    return F.when(m >= 1, F.struct(
        top["r"].cast("long").alias("top_cnt"),
        top_gram.alias("top_gram"),
        F.size(dup).cast("long").alias("dup_cnt"),
        dup_chars.alias("dup_chars"),
    )).otherwise(empty)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """REPETITION METRICS per document — the Gopher-rule family
    (Rae et al. 2021, "Scaling Language Models: ... Gopher", table A1:
    "fraction of characters in the most frequent n-gram" and
    "fraction of characters in duplicated n-grams"): the single most
    effective web-scale quality signal after length itself, because
    boilerplate, SEO spam, and template pages repeat short word
    n-grams at rates natural prose never reaches.

    Returns one row per document with EXACT-INTEGER numerators and
    denominators, never float ratios — ``(<id_col>, n_tokens,
    total_chars, top_ngram, top_ngram_count, top_ngram_chars,
    dup_ngram_count, dup_ngram_chars)`` — so results hash identically
    across engines and thresholding happens downstream by integer
    cross-multiplication (gopher_flags). Definitions: tokens are
    whitespace tokens of the trimmed text (token_count semantics);
    ``top_ngram`` is the most frequent *top_n*-gram with ties broken
    by the lexicographically greatest gram (a total order, so the
    winner is unique and deterministic); ``top_ngram_chars`` is its
    occurrence count times its character length (spaces included);
    ``dup_ngram_count``/``dup_ngram_chars`` count distinct
    *dup_n*-grams occurring >= 2 times and their ``count * length``
    character mass. Documents shorter than *n* tokens score zero; a
    NULL *text_col* row yields ZERO counts (top_ngram='',
    top_ngram_count=0, dup_*=0) but NULL ``n_tokens``/``total_chars``
    — so gopher_flags' integer cross-multiplications against the NULL
    sizes produce NULL (not false) flags and a NULL ``keep`` for such
    rows: null-text documents are neither kept nor flagged, they
    propagate as unknown (filter or coalesce upstream — the
    declared-query corpus has no null documents; behavior pinned in
    tests/test_repetition.py).

    Distributed shape (the 100 TB design): ZERO shuffle — the
    frequency statistics are per-document, so they never need a
    corpus aggregate at all: _gram_run_stats sorts each document's
    gram array and reads counts off the run boundaries inside one
    codegen projection (sort of an n_tokens-sized array per row, the
    classic turn-a-groupBy-into-an-array-expression move). The whole
    operator is a pure map over the corpus scan, the chunker's scale
    class — vs the natural explode + two hash aggregates, which
    shuffles O(corpus tokens) rows twice and measured 10x slower at
    bench scale. No explode, no window, no join, no Python."""
    if top_n < 1 or dup_n < 1:
        raise ValueError(
            f"ngram sizes must be >= 1, got top_n={top_n}, dup_n={dup_n}"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = _gram_run_stats(toks, top_n)
    d = _gram_run_stats(toks, dup_n)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.trim(F.col(text_col)))
        .cast("long")
        .alias("total_chars"),
        t["top_gram"].alias("top_ngram"),
        t["top_cnt"].alias("top_ngram_count"),
        (t["top_cnt"] * F.length(t["top_gram"]))
        .cast("long")
        .alias("top_ngram_chars"),
        d["dup_cnt"].alias("dup_ngram_count"),
        d["dup_chars"].alias("dup_ngram_chars"),
    )


def gopher_flags(
    stats: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_top_frac: str = "0.2",
    max_dup_frac: str = "0.2",
) -> DataFrame:
    """Quality FLAGS over repetition_stats output: adds boolean
    ``flag_short``, ``flag_long``, ``flag_top_ngram``,
    ``flag_dup_ngram`` and the conjunction ``keep``. Fraction
    thresholds are parsed as exact rationals and applied by INTEGER
    cross-multiplication (``chars_in_ngram * den > total_chars *
    num``) — no float division anywhere, so the booleans are exact,
    hash-stable, and restatable verbatim in any SQL engine. Pass
    thresholds as strings ("0.2") or Fractions; float literals are
    accepted but converted through their decimal string to avoid
    binary-float surprises."""
    from fractions import Fraction

    top = Fraction(str(max_top_frac))
    dup = Fraction(str(max_dup_frac))
    flag_top = F.col("top_ngram_chars") * F.lit(top.denominator) > F.col(
        "total_chars"
    ) * F.lit(top.numerator)
    flag_dup = F.col("dup_ngram_chars") * F.lit(dup.denominator) > F.col(
        "total_chars"
    ) * F.lit(dup.numerator)
    flag_short = F.col("n_tokens") < F.lit(int(min_tokens))
    flag_long = F.col("n_tokens") > F.lit(int(max_tokens))
    return stats.select(
        "*",
        flag_short.alias("flag_short"),
        flag_long.alias("flag_long"),
        flag_top.alias("flag_top_ngram"),
        flag_dup.alias("flag_dup_ngram"),
        (~flag_short & ~flag_long & ~flag_top & ~flag_dup).alias(
            "keep"
        ),
    )


def word_token_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WORD-level token-id sequences — the degenerate (zero-merge)
    tokenizer: each whitespace word of the lowercased trimmed text is
    one token, ids are dense ranks of the SORTED distinct vocabulary
    (bpe_doc_token_ids' id convention without the merge chain).
    Returns ``(<id_col>, token_ids array<long>, n_tokens)``. Useful
    as the cheap tokenizer for window/packing pipelines whose oracle
    or test wants token identity without BPE's training recursion
    (q281), and as the n_tokens source that exactly matches
    functions/text.py::token_count on non-empty text.

    Distributed shape: one explode, a vocabulary-bounded dense-rank
    window, a word-keyed join, and one per-document flatten aggregate
    — the bpe_doc_token_ids tail without the per-word subword
    explode."""
    from pyspark.sql.window import Window

    words = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("wpos", "w"),
        )
        .where(F.col("w") != "")
    )
    vocab = (
        words.select("w")
        .distinct()
        .select(
            "w",
            (F.row_number().over(Window.orderBy("w")) - 1)
            .cast("long")
            .alias("tok_id"),
        )
    )
    return (
        words.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("wpos", "tok_id"))
            ).alias("__d")
        )
        .select(
            id_col,
            F.col("__d").getField("tok_id").alias("token_ids"),
        )
        .withColumn("n_tokens", F.size("token_ids").cast("long"))
    )
