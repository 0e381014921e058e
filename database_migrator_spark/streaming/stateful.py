"""Custom stateful streaming operators (SURVEY.md §2B E18) via
``applyInPandasWithState`` — arbitrary per-key state with Arrow-batched
user code, the Spark-native replacement for hand-rolled stream processors.

Batch-equivalence is asserted in tests/test_streaming_stateful.py (the
driver's oracle gate covers the deterministic streaming queries in
streaming/windows.py; these operators emit per-batch incremental rows, so
their contract is "final state equals the batch answer", not row-hash
equality).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from database_migrator_spark.plans.registry import query

RUNNING_COUNT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total_cents bigint"


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents value total), updated every
    micro-batch. State is two int64s per key — bounded, shuffle-partitioned
    by user_id, so state size scales with |keys| not |events|."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(sum(int(round(v * 100)) for v in pdf["value"]))
        state.update((n, total_cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total_cents / 100.0]}
        )

    return events_stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "q71_stateful_running_totals",
    oracle="""
    SELECT user_id,
           COUNT(*)                                        AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState", "E18"),
)
def q71_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState hash-matched: run the custom per-key state
    machine as a real streaming query, then reduce the update-mode output
    to each key's FINAL state (counts are strictly monotone per key, so
    max_by(n_events) is batch-split-invariant) — which must equal the
    batch GROUP BY. Exact-cents totals keep the sum engine-independent."""
    from database_migrator_spark.sources import events_stream
    from database_migrator_spark.streaming.windows import run_stream_to_table

    out = run_stream_to_table(
        running_user_totals(events_stream(spark, sf_dir)),
        mode="update",
        state_partitions=8,  # per-key Python calls parallelize across
        # partitions; 8 measured best for this 1.5k-key state (sweep in
        # docs/ROUND5_NOTES.md) — commit overhead wins again past 16
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .orderBy("user_id")
    )


SESSION_SCHEMA = "user_id bigint, session_start string, n_events bigint"
_SESSION_STATE = "start_us bigint, last_us bigint, n bigint"


def sessionize_with_state(events_stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom gap-sessionizer on raw state — the applyInPandasWithState
    twin of session_window, for when session logic outgrows the built-in
    (per-session payloads, custom merge rules). Emits each CLOSED session;
    open sessions flush on event-time timeout.

    State per key: (session start, last event time, count) — three int64s,
    independent of session length.
    """
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        rows = []
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        events = []
        for pdf in pdfs:
            # event time arrives as int64 micros ("us", computed JVM-side)
            # so the 10k per-key update calls skip pandas timestamp parsing;
            # the remaining cost is the per-key Python invocation itself,
            # inherent to the applyInPandasWithState contract
            events.extend(int(u) for u in pdf["us"])
        events.sort()
        for t in events:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                rows.append((key[0], start_us, n))  # close previous session
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        if state.hasTimedOut:
            if start_us is not None:
                rows.append((key[0], start_us, n))
            state.remove()
        else:
            state.update((start_us, last_us, n))
            # timeout must be beyond the current watermark or Spark rejects it
            timeout_ms = max(
                last_us // 1000 + gap_seconds * 1000, state.getCurrentWatermarkMs() + 1
            )
            state.setTimeoutTimestamp(timeout_ms)
        # most keys close no session in a given batch (sessions stay open
        # until the gap or the timeout) — skip the pandas DataFrame
        # construction entirely for them instead of yielding ~10k empty
        # frames per micro-batch
        if rows:
            out = pd.DataFrame(rows, columns=["user_id", "start_us", "n_events"])
            out["session_start"] = pd.to_datetime(
                out["start_us"], unit="us"
            ).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
            yield out[["user_id", "session_start", "n_events"]]

    return (
        events_stream.select("user_id", "ts", F.unix_micros("ts").alias("us"))
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


@query(
    "q86_stateful_sessionize",
    # The streaming result is DETERMINISTIC, not merely a subset: the
    # single-file source delivers all events in one micro-batch, so the
    # output is exactly the batch gaps-and-islands sessionization MINUS
    # each user's final session when its event-time timeout has not fired
    # below the final watermark. The timeout fires iff
    #   w_ms > last_us // 1000 + gap_ms
    # with w_ms = max(event us) // 1000 - 600_000 (10-min watermark delay,
    # ms precision — Spark's event-time stats are milliseconds) and
    # gap_ms = 1_800_000. The oracle replays exactly that rule
    # (empirically verified: predicted withheld set == actual at
    # sf0.001/sf0.01/sf0.1).
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    ), agg AS (
        SELECT user_id, sid,
               MAX(sid) OVER (PARTITION BY user_id) AS max_sid,
               MIN(epoch_us(ts)) AS start_us,
               MAX(epoch_us(ts)) AS last_us,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    ), wm AS (
        SELECT MAX(epoch_us(ts)) // 1000 - 600000 AS w_ms FROM events
    )
    SELECT user_id,
           strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           n_events
    FROM agg, wm
    WHERE sid < max_sid OR w_ms > last_us // 1000 + 1800000
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "stateful", "session", "applyInPandasWithState", "E18"),
)
def q86_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom gap-sessionizer on raw per-key state (event-time timeouts)
    run as a real streaming query, hash-matched end-to-end: every session
    closed inline by a later event is emitted, and a user's FINAL session
    is emitted exactly when its gap timeout expired below the final
    watermark — a deterministic rule the gaps-and-islands oracle replays
    (see the oracle comment). q40 is the built-in session_window twin."""
    from database_migrator_spark.sources import events_stream
    from database_migrator_spark.streaming.windows import run_stream_to_table

    out = run_stream_to_table(
        sessionize_with_state(events_stream(spark, sf_dir)),
        mode="append",
        state_partitions=16,  # the 10k-key sessionizer is bound by per-key
        # Python invocations, which parallelize with partitions: measured
        # 5.8 s @4 → 4.5 s @16, but 10.8 s @32 (state-store commit cost
        # overtakes). A real cluster sizes this to key cardinality.
    )
    return out.orderBy("user_id", "session_start")
