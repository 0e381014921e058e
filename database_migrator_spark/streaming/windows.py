"""Structured Streaming operators (SURVEY.md §2B E17–E18) with
batch-equivalence oracles.

The declared queries *actually run a streaming query*: readStream over the
events parquet → watermarked windowed aggregation → memory sink →
processAllAvailable → return the materialized result. The DuckDB oracle is
the batch twin (time_bucket / DISTINCT), so the driver's hash check IS the
batch-equivalence proof.

Mode notes:
- windowed aggregations use output mode "complete" so the final
  micro-batch emits every window (in "append", windows above the final
  watermark would be withheld — the classic finite-source pitfall);
- the streaming dedup counts distinct keys, so the result is independent
  of which duplicate row wins — deterministic under any batch split.

Timestamps are emitted as formatted strings to avoid tz-dtype skew
between engines.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import to_cents
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import events_stream as _events_stream
from database_migrator_spark.sources import table


def run_stream_to_table(
    df: DataFrame, mode: str = "complete", state_partitions: int = 4
) -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink and
    return the materialized batch result.

    ``state_partitions`` bounds the stateful-operator partitioning for the
    stream: every micro-batch commits one state store per shuffle
    partition, so 32 partitions on a small local stream spend more time in
    store commits than in data (measured 16.2s → 3.5s on the sf0.1
    stream-stream join going 32 → 8, → 2.3s warm at 4; 2 is no better).
    A real cluster sizes this to key cardinality/throughput instead. The
    session's shuffle setting is restored afterwards — a stream latches
    its partitioning at start."""
    spark = df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@query(
    "q38_stream_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
           event_type,
           COUNT(*)                                         AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0  AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("streaming", "window", "E17"),
)
def q38_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 1-hour watermark, executed
    as a real streaming query; hash-matched against the batch time_bucket
    oracle (both epoch-aligned)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(to_cents("value")) / 100.0).alias("total_value"),
        )
    )
    out = run_stream_to_table(agg, mode="complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("w_start", "event_type")


@query(
    "q39_stream_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT unnest([
                 time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
               ]) AS w_start,
               event_type, value
        FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
           event_type,
           COUNT(*)                                        AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("streaming", "window", "E17"),
)
def q39_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (each event lands in exactly
    two windows; the oracle unnests the two epoch-aligned starts)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(to_cents("value")) / 100.0).alias("total_value"),
        )
    )
    out = run_stream_to_table(agg, mode="complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("w_start", "event_type")


@query(
    "q40_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "session", "E17"),
)
def q40_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) — Spark's native gap-session operator
    (usable in batch and streaming; a new session starts when the gap is
    ≥ the 30-minute timeout). Oracle reconstructs the same sessions with
    lag + running sum."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("min_ts"))
        .select(
            "user_id",
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q59_stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
    tags=("streaming", "dedup", "watermark", "E18"),
)
def q59_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup state bounded by the watermark
    horizon — the 100 TB streaming dedup (unbounded-key dropDuplicates
    state grows forever; this evicts keys older than the delay).

    Hash-gated batch-equivalence contract (upgraded from rows-only in
    round 10): the emitted MULTISET is inherently split-dependent — a
    key whose state was evicted past the watermark re-emits when it
    recurs in a later micro-batch, so per-row output (which event_id
    wins, how many epochs a key spans) varies with batch boundaries and
    partition order. What IS deterministic under ANY split is the
    emitted key DOMAIN: every key's first arrival passes the filter
    (no state yet) and is appended in that same micro-batch, and no
    key outside the data can appear — so DISTINCT over the emitted
    rows equals exactly the batch DISTINCT (user_id, event_type).
    That completeness+soundness invariant is what the oracle hashes;
    the eviction/re-emission behavior itself stays covered by
    tests/test_streaming_latedata.py::test_drop_duplicates_within_watermark."""
    dedup = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out = run_stream_to_table(dedup, mode="append")
    return out.distinct().orderBy("user_id", "event_type")


@query(
    "q41_stream_dedup_count",
    oracle="""
    SELECT COUNT(*) AS n_distinct_pairs
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
    tags=("streaming", "dedup", "E18"),
)
def q41_stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicates over the full stream state,
    then a streaming count — result independent of micro-batch splits."""
    deduped = (
        _events_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .agg(F.count("*").alias("n_distinct_pairs"))
    )
    return run_stream_to_table(deduped, mode="complete")
