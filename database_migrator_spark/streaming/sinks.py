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
