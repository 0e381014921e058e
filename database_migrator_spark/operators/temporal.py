"""Temporal operators Spark lacks natively: as-of join and gap-based
sessionization, both built from shuffles Spark already does well (no
Python, no quadratic joins).

As-of join strategy (the scalable one): union both sides tagged with a
side marker, single shuffle+sort on (key, ts, side, tiebreak), then
``last(value, ignorenulls=True)`` over an UNBOUNDED PRECEDING frame — each
left row picks up the most recent right row. One shuffle total, no range
explosion, skew handled by AQE. The per-group ``pd.merge_asof`` alternative
exists for wide payloads, but the window form stays fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Generic as-of (<=) join: for each left row, attach ``payload`` from
    the right row with the greatest (ts, tiebreak) such that right.ts <=
    left.ts within the same ``key``. Deterministic under timestamp ties via
    ``right_tiebreak``. Returns left columns + payload (nullable)."""
    l_cols = left.columns
    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*l_cols).alias("__left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).cast("long").alias("__tb"),
        F.lit(None).cast(lhs.schema["__left"].dataType).alias("__left"),
        *payload,
    )
    # Order: at equal __t, right rows (__side=0) precede left rows so `<=`
    # semantics hold; among right rows the greatest tiebreak wins.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", F.col("__tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lhs.unionByName(rhs).select(
        "__side",
        "__left",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    out = filled.where(F.col("__side") == 1).select(
        *[F.col("__left").getField(c).alias(c) for c in l_cols], *payload
    )
    return out


@query(
    "q23_asof_join_last_order",
    oracle="""
    SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderkey
        FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
    ) o ON TRUE
    ORDER BY e.event_id
    """,
    tags=("asof", "join", "custom-operator"),
)
def q23_asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order at
    or before the event timestamp (tie-broken by o_orderkey)."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_orderkey"),
    )
    joined = asof_join(
        e,
        o,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["last_orderkey"],
        right_tiebreak="last_orderkey",
    )
    return joined.select("event_id", "user_id", "last_orderkey").orderBy("event_id")


@query(
    "q24_sessionize",
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
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("session", "window", "custom-operator"),
)
def q24_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag
    → running sum = session id. One shuffle on user_id; the streaming twin
    is session_window (streaming/windows.py)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # exact integer microseconds on both engines (epoch_us ↔ unix_micros);
    # seconds-level unix_timestamp would truncate and flip boundary cases
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0).alias("new_session"),
    )
    numbered = marked.select(
        "user_id", "ts", F.sum("new_session").over(run).cast("long").alias("session_id")
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
        .orderBy("user_id", "session_id")
    )
