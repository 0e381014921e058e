"""Batch-equivalence for the custom stateful streaming operator: the final
per-user state from applyInPandasWithState must equal the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import to_cents
from database_migrator_spark.sources import events_stream, table
from database_migrator_spark.streaming.stateful import running_user_totals
from database_migrator_spark.streaming.windows import run_stream_to_table

from .conftest import SF_SMOKE


def test_running_user_totals_matches_batch(spark):
    out = run_stream_to_table(running_user_totals(events_stream(spark, SF_SMOKE)), mode="update")
    # the memory sink accumulates one row per (user, micro-batch); the last
    # update per user is the final state — with counts monotone, that's max
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value")
    )
    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(to_cents("value")) / 100.0).alias("total_value"),
        )
    )
    diff = final.join(batch, "user_id", "full").where(
        (final["n_events"] != batch["n_events"])
        | (F.abs(final["total_value"] - batch["total_value"]) > 1e-9)
        | final["n_events"].isNull()
        | batch["n_events"].isNull()
    )
    assert diff.count() == 0
    assert final.count() == batch.count()
