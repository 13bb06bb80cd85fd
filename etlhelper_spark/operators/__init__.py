from .etl import (
    CHUNKSIZE,
    copy_rows,
    copy_table_rows,
    dataframe_transform,
    execute,
    executemany,
    fetchall,
    fetchone,
    generate_insert_sql,
    iter_chunks,
    iter_rows,
    load,
)
from .cdc import apply_changes, read_snapshot_state, snapshot_apply_incremental
from .frequency_state import (
    heavy_hitters_incremental,
    read_frequency_state,
)
from .sample_state import weighted_sample_incremental
from .drift_state import (
    category_counts_incremental,
    chi2_against_state,
    embedding_drift_against_state,
    embedding_moments_incremental,
    histogram_incremental,
    psi_against_state,
    read_category_state,
    read_embedding_state,
    read_histogram_state,
    streaming_category_gate,
)
from .quantile_state import (
    quantile_sketch_incremental,
    quantiles_from_state,
    read_quantile_state,
)
from .export import deterministic_shuffle_rank, write_training_shards
from .dedup_state import (
    compact_dedup_state,
    duplicate_clusters_incremental,
    dedup_exact_incremental,
    dedup_exact_incremental_bloom,
    dedup_exact_incremental_bucketed,
    embedding_lsh_incremental,
    minhash_incremental,
    streaming_dedup_embedding,
    prune_state_versions,
    read_dedup_verdicts,
    streaming_dedup_exact,
)
from .index_state import inverted_index_incremental, read_index_top
from .jdbc_sink import stage_and_merge
from .expectations import check_expectations
from .maintenance import clustered_rewrite, compact_parquet_table, morton_code
from .merge import merge_dataframes, merge_into_parquet
from .observe import observed, row_metrics, run_with_metrics
from .profile import join_key_skew, profile_table

__all__ = [
    "clustered_rewrite",
    "compact_parquet_table",
    "morton_code",
    "observed",
    "profile_table",
    "check_expectations",
    "row_metrics",
    "run_with_metrics",
    "merge_dataframes",
    "merge_into_parquet",
    "CHUNKSIZE",
    "copy_rows",
    "copy_table_rows",
    "dataframe_transform",
    "execute",
    "executemany",
    "fetchall",
    "fetchone",
    "generate_insert_sql",
    "iter_chunks",
    "iter_rows",
    "load",
    "apply_changes",
    "read_snapshot_state",
    "snapshot_apply_incremental",
    "stage_and_merge",
    "join_key_skew",
    "compact_dedup_state",
    "dedup_exact_incremental",
    "dedup_exact_incremental_bloom",
    "dedup_exact_incremental_bucketed",
    "duplicate_clusters_incremental",
    "embedding_lsh_incremental",
    "minhash_incremental",
    "streaming_dedup_embedding",
    "heavy_hitters_incremental",
    "read_frequency_state",
    "weighted_sample_incremental",
    "inverted_index_incremental",
    "prune_state_versions",
    "read_dedup_verdicts",
    "read_index_top",
    "streaming_dedup_exact",
    "category_counts_incremental",
    "chi2_against_state",
    "embedding_drift_against_state",
    "embedding_moments_incremental",
    "histogram_incremental",
    "psi_against_state",
    "read_category_state",
    "streaming_category_gate",
    "read_embedding_state",
    "read_histogram_state",
    "quantile_sketch_incremental",
    "quantiles_from_state",
    "read_quantile_state",
    "deterministic_shuffle_rank",
    "write_training_shards",
]
