"""Watermark semantics (E17): in append mode, an event arriving after the
watermark has passed its window must be dropped; on-time late events within
the allowed lateness must still be counted.

Uses a two-file stream processed with maxFilesPerTrigger=1 so micro-batch 1
advances the watermark and micro-batch 2 delivers the late rows.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pandas as pd

from pyspark.sql import functions as F


def _write_parquet(path, rows):
    pd.DataFrame(rows, columns=["key", "ts"]).to_parquet(
        path, coerce_timestamps="us", allow_truncated_timestamps=True
    )


def test_append_mode_drops_data_later_than_watermark(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    # batch 1: events up to t+120min → watermark becomes 120-10=110min
    _write_parquet(
        stream_dir / "a.parquet",
        [("a", ts(1)), ("a", ts(5)), ("b", ts(61)), ("b", ts(120))],
    )

    schema = "key string, ts timestamp"
    src = spark.readStream.schema(schema).parquet(str(stream_dir))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "key")
        .agg(F.count("*").alias("n"))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()  # batch 1 processed; watermark now 110min
    # batch 2: one row in window [0,60) — far below watermark → dropped;
    # one row in window [60,120) — its window end (120) > watermark → kept
    _write_parquet(
        stream_dir / "b.parquet",
        [("a", ts(2)), ("b", ts(95))],
    )
    q.processAllAvailable()
    # batch 3: advance the watermark past 120 so window [60,120) closes
    # and append mode emits it
    _write_parquet(stream_dir / "c.parquet", [("c", ts(200))])
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    got = {
        (r["key"], r["window"]["start"].minute + 60 * r["window"]["start"].hour): r["n"]
        for r in spark.table(name).collect()
    }
    # window [0,60): only the 2 on-time 'a' rows — the late ts(2) from
    # batch 2 was dropped (watermark 110 > window end 60)
    assert got.get(("a", 0)) == 2
    # window [60,120): b had ts(61), ts(120) lands in [120,180); the late
    # ts(95) from batch 2 was accepted (window end 120 ≥ watermark 110)
    assert got.get(("b", 60)) == 2


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Duplicates inside the watermark horizon are dropped; a key recurring
    AFTER its state was evicted (watermark passed) is emitted again."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    schema = "key string, ts timestamp"
    src = (
        spark.readStream.schema(schema).parquet(str(stream_dir))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["key"])
    )
    name = f"ddww_{uuid.uuid4().hex[:8]}"
    q = src.writeStream.outputMode("append").format("memory").queryName(name).start()

    # batch 1: 'a' twice within minutes → one survivor; watermark → 50
    _write_parquet(stream_dir / "a.parquet", [("a", ts(0)), ("a", ts(5)), ("b", ts(60))])
    q.processAllAvailable()
    # batch 2: 'a' again at t=120 — far past its evicted state → re-emitted
    _write_parquet(stream_dir / "b.parquet", [("a", ts(120)), ("b", ts(61))])
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    rows = [(r.key, r.ts) for r in spark.table(name).collect()]
    a_rows = sorted(t for k, t in rows if k == "a")
    b_rows = sorted(t for k, t in rows if k == "b")
    assert a_rows == [ts(0), ts(120)]  # dup at ts(5) dropped; ts(120) re-emitted
    assert b_rows == [ts(60)]  # ts(61) dup within horizon dropped


def test_left_outer_join_nulls_gated_by_filtered_watermark(spark, tmp_path):
    """q185's emission rule, on a hand corpus: (a) an unmatched error
    whose join window has passed the watermark null-extends; (b) one
    still inside the watermark stays pending forever (finite source);
    (c) the watermark advances on the ERROR∪PURCHASE stream only — a
    later event of another type does NOT advance it (the
    EventTimeWatermark node sits above the type filters)."""
    import tempfile

    from database_migrator_spark.streaming.windows import run_stream_to_table

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, hours, user, etype):
        return (eid, t0 + dt.timedelta(hours=hours), user, etype)

    rows = [
        ev(1, 0.0, 5, "error"),      # window end 1.0h << wm 4h -> null row
        ev(2, 5.0, 5, "error"),      # window end 6h > wm 4h -> pending
        ev(3, 5.5, 5, "purchase"),   # matches error 2; max e/p ts = 6h
        ev(4, 6.0, 7, "purchase"),   # advances e∪p watermark to 4h
        ev(5, 20.0, 9, "view"),      # other type: must NOT advance wm
        ev(6, 3.0, 8, "error"),      # window end 4h == wm 4h -> pending
    ]
    d = tempfile.mkdtemp(prefix="lo_wm_", dir=str(tmp_path))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.mode("overwrite").parquet(d)
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string"
    ).parquet(d)
    evs = src.withWatermark("ts", "2 hours")
    errors = evs.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("error_id"),
    )
    purchases = evs.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
        F.col("event_id").alias("followup_id"),
    )
    j = errors.join(
        purchases,
        (F.col("e_user") == F.col("f_user"))
        & (F.col("f_ts") > F.col("e_ts"))
        & (F.col("f_ts") <= F.col("e_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("error_id", "followup_id")
    got = {
        (r["error_id"], r["followup_id"])
        for r in run_stream_to_table(j, mode="append").collect()
    }
    # matched pair emits; error 1 null-extends; errors 2 and 6 pend; if
    # the 'view' at 20h advanced the watermark, 2 and 6 would null-extend
    # and this set would differ
    assert got == {(2, 3), (1, None)}
