"""Change-data-capture apply: fold an ordered change feed into a
snapshot (the incremental-ingestion primitive).

The reference's closest surface is row-wise upsert SQL via
`executemany` (etlhelper/etl.py:233-339) and the docs' ON CONFLICT
recipes (docs/etl_functions/error_handling.rst); `operators/merge.py`
covers the set-based MERGE equivalent.  `apply_changes` is the
feed-shaped variant — the Delta-Lake/DLT "APPLY CHANGES INTO" pattern
re-expressed on plain DataFrames:

- one window over (keys, seq desc) picks each key's latest version —
  a single hash shuffle on the key columns, no join;
- snapshot rows enter the same window with NULL sequence (they lose
  to ANY change row for the key, win when a key has no changes);
- delete ops drop the key from the result.

At 100 TB the shuffle is on the snapshot+feed keyed rows; since the
feed is normally ≪ snapshot, the scale path is to pre-bucket the
snapshot by key so only the feed shuffles (same co-location argument
as `sources/bucketing.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_value: str = "D",
) -> DataFrame:
    """Apply *changes* (with op + sequence columns) onto *snapshot*.

    snapshot: current state, one row per key, same data columns as
    *changes* minus ``op_col``/``seq_cols`` (pass None for an initial
    load).  changes: feed rows where ``op_col`` is insert/update (any
    value) or ``delete_value``, ordered per key by ``seq_cols``.

    Returns the next snapshot: latest non-delete version per key,
    without the op/sequence bookkeeping columns.
    """
    feed = changes
    if snapshot is not None:
        snap = snapshot
        for c in seq_cols:
            snap = snap.withColumn(
                c, F.lit(None).cast(dict(changes.dtypes)[c])
            )
        snap = snap.withColumn(op_col, F.lit("I"))
        feed = snap.select(changes.columns).unionByName(feed)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc_nulls_last() for c in seq_cols]
    )
    return (
        feed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where(F.col(op_col) != delete_value)
        .drop("__rn", op_col, *seq_cols)
    )
