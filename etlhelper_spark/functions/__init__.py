"""Spark-native data-pipeline functions beyond the reference surface.

These are the LLM-training-data operators named in BASELINE.json:
deduplication, similarity search, text analysis, multimodal columns.
All hot paths are built-in pyspark.sql.functions expressions (JVM-side,
whole-stage codegen); Python only appears in clearly-marked stubs.
"""

from .dedup import (
    dedup_exact,
    lsh_tuning,
    duplicate_clusters,
    embedding_near_duplicates,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    select_survivors,
    semantic_dedup,
    simhash,
)
from .calibrate import logit_train
from .clustering import kmeans_assignments
from .drift import (
    equal_width_bin,
    histogram_counts,
    ks_2samp,
    null_rate_drift,
    psi_report,
    schema_drift,
)
from .multimodal import read_media_dir
from .similarity import (
    brute_force_topk,
    cosine_similarity,
    embedding_covariance,
    ivf_topk,
    lsh_bucket_topk,
    mahalanobis_scores,
    whiten_embeddings,
)
from .pq import (
    append_pq_codes,
    build_pq_index,
    load_pq_codebooks,
    pq_adc_topk,
    pq_codebook_df,
    pq_encode,
    pq_train,
    read_pq_codes,
)
from .ivfpq import (
    append_ivfpq_index,
    build_ivfpq_index,
    query_ivfpq_index,
    streaming_ivfpq_ingest,
)
from .util import (
    heavy_hitters,
    in_filter_join,
    range_join,
    salted_join,
    stratified_weighted_sample,
    weighted_sample,
)
from .text import (
    bpe_merges,
    document_fingerprint,
    language_id,
    quality_logit,
    quality_score,
    redact_pii,
    text_stats,
    token_count,
    top_tokens,
    unigram_surprisal,
    winnow_fingerprints,
)

__all__ = [
    "brute_force_topk",
    "cosine_similarity",
    "embedding_covariance",
    "mahalanobis_scores",
    "whiten_embeddings",
    "dedup_exact",
    "bpe_merges",
    "document_fingerprint",
    "duplicate_clusters",
    "embedding_near_duplicates",
    "heavy_hitters",
    "append_ivfpq_index",
    "build_ivfpq_index",
    "query_ivfpq_index",
    "streaming_ivfpq_ingest",
    "append_pq_codes",
    "build_pq_index",
    "load_pq_codebooks",
    "pq_adc_topk",
    "pq_codebook_df",
    "pq_encode",
    "pq_train",
    "read_pq_codes",
    "in_filter_join",
    "ivf_topk",
    "kmeans_assignments",
    "logit_train",
    "language_id",
    "lsh_bucket_topk",
    "lsh_tuning",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_logit",
    "quality_score",
    "range_join",
    "read_media_dir",
    "redact_pii",
    "salted_join",
    "stratified_weighted_sample",
    "weighted_sample",
    "select_survivors",
    "semantic_dedup",
    "simhash",
    "text_stats",
    "token_count",
    "top_tokens",
    "unigram_surprisal",
    "winnow_fingerprints",
    "equal_width_bin",
    "histogram_counts",
    "ks_2samp",
    "null_rate_drift",
    "psi_report",
    "schema_drift",
]
