"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming surface; this is the extension point
for arbitrary per-key state machines over unbounded streams — running
aggregates, cross-batch dedup, CDC-style accumulation — that the
built-in windowed aggregations can't express.

State lives in the state store (checkpointed, rocksdb-compatible),
keyed by the groupBy key; each micro-batch delivers that key's new
rows as Arrow batches to the update function. At scale the shuffle is
on the key only, and state size is bounded by keys × state row width
(plus timeouts for eviction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_user_totals(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Per-user running totals maintained as custom stream state.

    readStream(events) → groupBy(user_id) → applyInPandasWithState
    (state = (total_value, n_events), updated per micro-batch, emitted
    in update mode) → memory sink drained with availableNow. The
    final per-user emission equals the batch groupBy aggregate — the
    invariant the test/oracle checks.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .windows import read_events_stream

    def update(key, pdfs, state):
        if state.exists:
            total, count = state.get
        else:
            total, count = 0.0, 0
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            count += len(pdf)
        state.update((total, count))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_value": [total],
                "n_events": [count],
            }
        )

    stream = read_events_stream(spark, sf_dir)
    updates = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, total_value double, n_events long",
        stateStructType="total_value double, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    query = (
        updates.writeStream.format("memory")
        .queryName("running_user_totals")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    emitted = spark.table("running_user_totals")
    # update mode emits once per key per batch; the final state per
    # user is the emission with the highest n_events
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id",
            F.round("total_value", 2).alias("total_value"),
            "n_events",
        )
    )
