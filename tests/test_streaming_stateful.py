"""Batch-equivalence for the custom stateful streaming operator: the final
per-user state from applyInPandasWithState must equal the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import to_cents
from database_migrator_spark.sources import events_stream, table
from database_migrator_spark.streaming.stateful import (
    running_user_totals,
    sessionize_with_state,
)
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


def test_stateful_sessionizer_matches_batch_sessions(spark):
    """Every emitted session must be a true session of the batch
    computation; every *closed* session (all but each user's final one)
    must be emitted — final sessions depend on the event-time timeout
    firing after the last batch."""
    from pyspark.sql import Window

    out = run_stream_to_table(
        sessionize_with_state(events_stream(spark, SF_SMOKE)), mode="append"
    )
    emitted = {
        (r.user_id, r.session_start, r.n_events) for r in out.collect()
    }

    # batch truth: same lag/cumsum logic as q24 but strict > gap
    e = table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    sessions = (
        e.select(
            "user_id",
            "ts",
            F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0).alias("ns"),
        )
        .select("user_id", "ts", F.sum("ns").over(run).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.count("*").alias("n_events"),
            F.max("sid").alias("_sid"),
        )
    )
    last_sid = sessions.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    truth_all = {
        (r.user_id, r.session_start, r.n_events) for r in sessions.collect()
    }
    truth_closed = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessions.join(last_sid, "user_id").where(F.col("sid") != F.col("last_sid")).collect()
    }
    assert emitted <= truth_all
    assert truth_closed <= emitted
