"""Incremental cross-run deduplication against persisted state.

Every operator in functions/dedup.py deduplicates a corpus against
ITSELF; a production training-data pipeline ingests batch N+1 against
the accumulated fingerprint/signature store of batches 1..N without
recomputing anything for the old corpus. This module is the IVM
state-store pattern (operators/ivm.py — versioned parquet state,
replay-idempotent per batch id) applied to the dedup substrate
(functions/dedup.py — content fingerprints and MinHash LSH bands).

State layout under ``state_dir``::

    exact/batch=<id>/   (fingerprint, survivor_id, batch)
    bands/batch=<id>/   (id, band, band_key, batch)

Both stores are APPEND-ONLY — the natural shape for dedup state,
because a first-seen survivor never changes and band keys are
immutable per document. Each apply writes ONLY its own ``batch=<id>``
subdir (O(new batch), never O(corpus)) and a replayed batch id
OVERWRITES its own subdir — idempotent under at-least-once delivery,
the same ledger discipline as streaming_incremental_rollup. Batches
are identified by a caller-supplied monotonically increasing integer;
"first seen" ties inside one batch break by lowest id.

100 TB design notes:

- Per-batch cost: O(batch) fingerprint/signature compute (linear
  scans, the same kernels as the batch operators) + one equi-join of
  the new batch's keys against the accumulated state. The state side
  is |distinct fingerprints| / |corpus × bands| rows of ~50-byte keys
  — orders of magnitude smaller than the corpus text it summarizes.
- The state join shuffles both sides on the key. When the state
  outgrows comfortable shuffle size, the upgrade is mechanical:
  persist the state as a parquet table bucketed on the join key
  (``bucketBy(n, "fingerprint").sortBy(...).saveAsTable``) and the
  per-batch join shuffles ONLY the new batch into the bucket layout —
  the accumulated state never moves again. The path-based layout here
  keeps the operator self-contained (no metastore dependency) and is
  bit-compatible with that upgrade.
- Appends are repartitioned small (new-fingerprint count per batch is
  bounded by batch size) so state files stay few and scan-friendly.

Correctness contract (oracle-verified in q176/q177): after applying
batches 1..N in order, the union of the per-batch verdicts equals the
FULL-CORPUS recompute — survivors are first-seen (batch asc, id asc)
for the exact store, and the incremental candidate-pair union equals
minhash_lsh_candidates over the whole corpus.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prior_batches(subdir: str, batch_id: int) -> list[str]:
    """Paths of state appends with batch id strictly below *batch_id*
    (replay safety: a re-run of batch N must not see N's own or any
    later append as 'prior')."""
    out = []
    for p in glob.glob(os.path.join(subdir, "batch=*")):
        try:
            b = int(os.path.basename(p).split("=", 1)[1])
        except ValueError:
            continue
        if b < batch_id:
            out.append(p)
    return sorted(out)


def _read_prior(spark, subdir: str, batch_id: int) -> DataFrame | None:
    paths = _prior_batches(subdir, batch_id)
    if not paths:
        return None
    return spark.read.parquet(*paths)


def dedup_exact_incremental(
    new_df: DataFrame,
    state_dir: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    state_partitions: int = 1,
) -> DataFrame:
    """Deduplicate *new_df* against the accumulated fingerprint state,
    then append this batch's NEW fingerprints to it.

    Returns one verdict row per new document:
    (id, fingerprint, survivor_id, kept) where ``survivor_id`` is the
    FIRST-SEEN document with the same content across all batches
    applied so far (earliest batch, lowest id within it) and ``kept``
    marks the survivor itself. Equivalent to running
    functions/dedup.py::dedup_exact over the full corpus with
    first-seen-wins ordering — the oracle contract of
    q176_dedup_incremental.

    Plan shape: one fingerprint scan of the batch, one groupBy on the
    fingerprint (batch-local survivor election), one left join against
    prior state, and an O(new fingerprints) append. History text is
    never re-read.
    """
    from ..functions.text import document_fingerprint

    spark = new_df.sparkSession
    subdir = os.path.join(state_dir, "exact")
    fp = (
        document_fingerprint(F.col(text_col))
        if normalize
        else F.md5(F.col(text_col))
    )
    fps = new_df.select(
        F.col(id_col).alias("id"), fp.alias("fingerprint")
    ).localCheckpoint()  # consumed twice (survivor election + verdict)
    id_type = fps.schema["id"].dataType
    # batch-local survivor: lowest id per fingerprint among NEW docs
    batch_surv = fps.groupBy("fingerprint").agg(
        F.min("id").alias("batch_survivor")
    )
    prior = _read_prior(spark, subdir, batch_id)
    if prior is not None:
        # one survivor per fingerprint across prior appends (unique by
        # construction — a fingerprint is appended only when unseen;
        # min_by(batch) guards against out-of-order replays anyway)
        prior_surv = prior.groupBy("fingerprint").agg(
            F.min_by("survivor_id", F.struct("batch", "survivor_id")).alias(
                "prior_survivor"
            )
        )
        resolved = batch_surv.join(prior_surv, "fingerprint", "left")
    else:
        resolved = batch_surv.withColumn(
            "prior_survivor", F.lit(None).cast(id_type)
        )
    resolved = resolved.select(
        "fingerprint",
        F.coalesce("prior_survivor", "batch_survivor").alias("survivor_id"),
        F.col("prior_survivor").isNull().alias("__new_fp"),
    ).localCheckpoint()  # consumed twice (state append + verdict join)
    # append ONLY unseen fingerprints, with their first-seen survivor
    appends = resolved.where(F.col("__new_fp")).select(
        "fingerprint",
        "survivor_id",
        F.lit(int(batch_id)).alias("batch"),
    )
    appends.repartition(state_partitions).write.mode("overwrite").parquet(
        os.path.join(subdir, f"batch={int(batch_id)}")
    )
    # verdicts read the RESOLVED survivors (not the files — same
    # values, no re-read); kept = this doc IS the first-seen survivor
    return fps.join(
        resolved.select("fingerprint", "survivor_id"), "fingerprint"
    ).select(
        F.col("id"),
        "fingerprint",
        "survivor_id",
        (F.col("id") == F.col("survivor_id")).alias("kept"),
    )


def minhash_incremental(
    new_df: DataFrame,
    state_dir: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    state_partitions: int = 1,
) -> DataFrame:
    """Near-duplicate candidate pairs of *new_df* against everything
    seen so far (prior batches AND this batch), then append this
    batch's band keys to the state.

    Returns (id_a, id_b) with id_a < id_b: the union of
    cross-run collisions (new doc shares a band bucket with a
    previously-ingested doc) and intra-batch collisions (the ordinary
    LSH self-join restricted to the new batch). Applying batches 1..N
    in order and unioning the results yields EXACTLY
    minhash_lsh_candidates over the full corpus — banding is per-doc
    deterministic, so every colliding pair is emitted in the batch
    that completes it, once. That recompute-equivalence is the oracle
    contract of q177_minhash_incremental.

    Plan shape: the batch's signatures compute once (the wide
    single-groupBy minhash kernel); candidates come from one equi-join
    of the batch's band keys against the accumulated band state plus
    one batch-local self-join — shuffle keys are (band, band_key)
    buckets, never all pairs, exactly like the batch operator. The
    state append is O(batch × bands) rows of band keys.
    """
    from ..functions.dedup import minhash_band_keys

    spark = new_df.sparkSession
    subdir = os.path.join(state_dir, "bands")
    keys = minhash_band_keys(
        new_df, id_col, text_col, num_hashes, bands, shingle_size
    ).localCheckpoint()  # consumed 3x (2 joins + append): compute once
    prior = _read_prior(spark, subdir, batch_id)
    n = keys.alias("n")
    intra = (
        n.join(
            keys.alias("m"),
            (F.col("n.band") == F.col("m.band"))
            & (F.col("n.band_key") == F.col("m.band_key"))
            & (F.col("n.id") < F.col("m.id")),
        )
        .select(F.col("n.id").alias("id_a"), F.col("m.id").alias("id_b"))
    )
    if prior is not None:
        cross = (
            n.join(
                prior.alias("p"),
                (F.col("n.band") == F.col("p.band"))
                & (F.col("n.band_key") == F.col("p.band_key")),
            )
            .select(
                F.least(F.col("n.id"), F.col("p.id")).alias("id_a"),
                F.greatest(F.col("n.id"), F.col("p.id")).alias("id_b"),
            )
        )
        pairs = intra.unionAll(cross)
    else:
        pairs = intra
    keys.withColumn("batch", F.lit(int(batch_id))).repartition(
        state_partitions
    ).write.mode("overwrite").parquet(
        os.path.join(subdir, f"batch={int(batch_id)}")
    )
    return pairs.distinct()
