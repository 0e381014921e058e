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
