"""Watermark late-data semantics (stream.py sessionize_stream contract).

The documented policy: rows arriving later than the watermark are DROPPED
before the session aggregation (the batch job over the table snapshot is the
source of truth). This drives a real two-micro-batch file replay where the
second batch delivers (a) a row hours behind the watermark established by
batch 1 — must be dropped — and (b) a late-but-within-watermark row — must
still extend its session.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyxus_spark.streaming import sessionize_stream

BASE_US = 1_700_000_000_000_000  # fixed event-time origin (epoch micros)


def _write_batch(path, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts_us"])
    pdf["ts_us"] = pdf["ts_us"].astype("int64")
    pdf.to_parquet(path)
    os.utime(path, (mtime, mtime))


def _hours(h):
    return BASE_US + int(h * 3_600_000_000)


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    """A row that arrives ≥ 2 micro-batches behind the data that established
    the covering watermark is dropped before the session aggregation.

    (Measured Spark nuance, documented in stream.py: the late-row filter
    uses the watermark COMMITTED at the previous batch boundary, one batch
    behind the progress-reported value — so the drop guarantee starts one
    batch later than a naive reading of the watermark would suggest.)"""
    stream_dir = str(tmp_path / "events")
    os.makedirs(stream_dir)
    # batch 0: key A events at 10h00..10h05 → watermark (5 min delay) 10h00
    b0 = [("A", _hours(10)), ("A", _hours(10) + 60_000_000),
          ("A", _hours(10) + 300_000_000)]
    # batch 1: within-gap row at 10h06 extends the open session
    b1 = [("A", _hours(10) + 360_000_000)]
    # batch 2: t=0h — 10 hours behind the committed watermark → DROPPED
    b2 = [("A", _hours(0))]
    for i, rows in enumerate((b0, b1, b2)):
        _write_batch(os.path.join(stream_dir, f"b{i}.parquet"), rows,
                     (i + 1) * 1_000_000)

    src = (
        spark.readStream.schema("doc_id string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select("doc_id", F.timestamp_micros(F.col("ts_us")).alias("ts"))
    )
    sess = sessionize_stream(src, gap_seconds=600.0, watermark="5 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")  # append: only watermark-closed sessions emit
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress if p["stateOperators"]
    )
    assert dropped == 1, [
        (p["batchId"], p["numInputRows"]) for p in q.recentProgress
    ]
    out = spark.sql(
        "SELECT doc_id, unix_micros(session_start) AS s, n_events "
        "FROM late_sessions ORDER BY s"
    ).collect()
    # had the 0h row survived, its session (end 0h10 < final watermark)
    # would have emitted; the open 10h session is correctly still held in
    # state (its end is past the final watermark) — so output is empty
    assert all(r["s"] >= _hours(10) for r in out), out


def test_on_time_replay_keeps_every_row(spark, tmp_path):
    """Control: the same replay without late rows loses nothing."""
    stream_dir = str(tmp_path / "events_ok")
    os.makedirs(stream_dir)
    b1 = [("A", _hours(1)), ("A", _hours(1) + 60_000_000)]
    b2 = [("A", _hours(3)), ("B", _hours(3) + 30_000_000)]
    _write_batch(os.path.join(stream_dir, "b1.parquet"), b1, 1_000_000)
    _write_batch(os.path.join(stream_dir, "b2.parquet"), b2, 2_000_000)
    src = (
        spark.readStream.schema("doc_id string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select("doc_id", F.timestamp_micros(F.col("ts_us")).alias("ts"))
    )
    sess = sessionize_stream(src, gap_seconds=600.0, watermark="5 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("ok_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = spark.sql("SELECT SUM(n_events) AS n FROM ok_sessions").first()["n"]
    assert total == 4
