"""Custom per-partition sinks: the reference's DB→API recipe surface
(reference: docs/code_demos/recipes/database_to_api.py — chunk-wise
POST to REST/Elasticsearch), distributed.

The reference pulls chunks to the client and POSTs them one at a
time; here every partition posts its own batches concurrently from
the executors — N partitions ⇒ N concurrent producers against the
target service, with per-batch error isolation feeding a rejected-row
accumulator instead of aborting the job.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

Batch = list[dict[str, Any]]


def foreach_batch_sink(
    df: DataFrame,
    send: Callable[[Batch], None],
    batch_size: int = 5000,
    on_error: str = "raise",
) -> tuple[int, int]:
    """Deliver *df* to *send(batch_of_dicts)* partition-parallel.

    ``send`` runs on executors (it must be picklable and create its
    own clients — e.g. build the HTTP session inside). Batches are
    lists of plain dicts of size ≤ batch_size, mirroring the
    reference's chunk-wise POST loop.

    on_error: 'raise' aborts the job on the first failed batch;
    'skip' counts failed rows and continues (dead-letter semantics —
    the (processed, failed) contract of the reference's load family).
    Returns (processed, failed) from accumulators.
    """
    sc = df.sparkSession.sparkContext
    processed_acc = sc.accumulator(0)
    failed_acc = sc.accumulator(0)
    skip = on_error == "skip"

    def run_partition(rows) -> None:
        batch: Batch = []

        def flush() -> None:
            if not batch:
                return
            try:
                send(batch)
                processed_acc.add(len(batch))
            except Exception:
                if not skip:
                    raise
                failed_acc.add(len(batch))
            batch.clear()

        for row in rows:
            batch.append(row.asDict())
            if len(batch) >= batch_size:
                flush()
        flush()

    df.foreachPartition(run_partition)
    return processed_acc.value, failed_acc.value
