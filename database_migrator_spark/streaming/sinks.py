"""Streaming sinks (E17/E18 write side).

``foreach_batch_parquet`` is the exactly-once pattern for sinks without
native streaming support: each micro-batch lands as an idempotent
partition overwrite keyed by batch id, so a replayed batch (failure →
restart from checkpoint) overwrites rather than duplicates. At 100 TB the
same shape writes to Delta/Iceberg with a MERGE or txn-id dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
):
    """Write a streaming DataFrame to parquet, one idempotent directory
    per micro-batch (batch_id partition). Returns the started query.

    Append mode (stateless row pipelines): the union of batch dirs is the
    stream, each row exactly once. For aggregations pass
    ``output_mode="complete"`` and read only the latest batch dir.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # overwrite-by-batch-id = replay-safe (exactly-once effective)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from database_migrator_spark.plans.registry import query  # noqa: E402


@query(
    "q149_exactly_once_sink",
    oracle="""
    SELECT event_type,
           COUNT(*)                                        AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "sink", "exactly-once", "foreachBatch", "E17", "E18"),
)
def q149_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once WRITE side as a declared, hash-matched query: run
    the events stream through ``foreach_batch_parquet`` (idempotent
    overwrite-by-batch-id directories — a replayed micro-batch after a
    checkpoint restart overwrites instead of duplicating; replay
    idempotency itself is unit-tested in tests/test_streaming_sinks.py),
    then read the landed files back and aggregate. Equality with the
    batch GROUP BY proves the sink delivered every row exactly once —
    the end-to-end guarantee a streaming pipeline's consumers actually
    depend on. Exact-cents sums keep the totals engine-independent.

    Output/checkpoint dirs are process-scoped scratch (``scratch.py``)
    keyed by (application, sf_dir): a re-invocation in the same process
    reuses the checkpoint, the availableNow trigger replays nothing, the
    already-landed batch dirs are re-read — the idempotence the sink
    guarantees — and process exit removes the tree, so repeated
    bench/gate/probe sweeps leave no /tmp residue."""
    from database_migrator_spark.scratch import scratch_dir
    from database_migrator_spark.sources import events_stream

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    out = scratch_dir("q149_out", *key)
    ckpt = scratch_dir("q149_ckpt", *key)
    src = events_stream(spark, sf_dir).select("event_type", "value")
    q = foreach_batch_parquet(src, out, ckpt)
    q.awaitTermination()
    back = spark.read.parquet(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "total_value"
            ),
        )
        .orderBy("event_type")
    )
