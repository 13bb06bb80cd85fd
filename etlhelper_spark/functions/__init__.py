"""Spark-native data-pipeline functions beyond the reference surface.

These are the LLM-training-data operators named in BASELINE.json:
deduplication, similarity search, text analysis, multimodal columns.
All hot paths are built-in pyspark.sql.functions expressions (JVM-side,
whole-stage codegen); Python only appears in clearly-marked stubs.
"""

from .dedup import (
    dedup_exact,
    embedding_near_duplicates,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import brute_force_topk, cosine_similarity, lsh_bucket_topk
from .text import (
    document_fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count,
    top_tokens,
)

__all__ = [
    "brute_force_topk",
    "cosine_similarity",
    "dedup_exact",
    "document_fingerprint",
    "embedding_near_duplicates",
    "language_id",
    "lsh_bucket_topk",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_score",
    "simhash",
    "text_stats",
    "token_count",
    "top_tokens",
]
