"""Streaming exact dedup (streaming/dedup.py): cross-batch key state and
the bounded-state watermark variant's eviction/re-admission contract."""

import os

import pandas as pd
from pyspark.sql import functions as F

from nyxus_spark.streaming.dedup import (
    DEDUP_IN_SCHEMA,
    dedup_stream,
    dedup_stream_within_watermark,
)

BASE_US = 1_700_000_000_000_000


def _write(path, rows, cols, mtime):
    pd.DataFrame(rows, columns=cols).to_parquet(path)
    os.utime(path, (mtime, mtime))


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    # batch 0: k1 (twice, same batch), k2; batch 1: k1 again, k3
    _write(os.path.join(d, "b0.parquet"),
           [("k1", "a", 0), ("k1", "b", 0), ("k2", "c", 0)],
           ["key", "doc_id", "batch"], 1_000_000)
    _write(os.path.join(d, "b1.parquet"),
           [("k1", "d", 1), ("k3", "e", 1)],
           ["key", "doc_id", "batch"], 2_000_000)
    src = (spark.readStream.schema(DEDUP_IN_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(d))
    q = (dedup_stream(src).writeStream.format("memory")
         .queryName("t_dedup_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("t_dedup_stream").collect()
    got = {(r.key, r.batch) for r in out}
    assert len(out) == 3  # one survivor per key
    assert got == {("k1", 0), ("k2", 0), ("k3", 1)}


def test_dedup_within_watermark_evicts_then_readmits(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)

    def ts(minutes):
        return BASE_US + minutes * 60_000_000

    # batch 0: k1 at t=0; batch 1: k1 dup at t=1 (inside 5-min window,
    # dropped) plus a watermark-advancing row at t=60; batch 2: another
    # advancing row (the drop/evict filter lags the progress-reported
    # watermark by ONE batch — measured, tests/test_streaming_late_data.py);
    # batch 3: k1 again at t=62 — state evicted (committed watermark ~t=55
    # > t=0 + 5 min) → ADMITTED
    _write(os.path.join(d, "b0.parquet"), [("k1", "a", ts(0))],
           ["key", "doc_id", "ts_us"], 1_000_000)
    _write(os.path.join(d, "b1.parquet"),
           [("k1", "b", ts(1)), ("adv", "w", ts(60))],
           ["key", "doc_id", "ts_us"], 2_000_000)
    _write(os.path.join(d, "b2.parquet"), [("adv2", "x", ts(61))],
           ["key", "doc_id", "ts_us"], 3_000_000)
    _write(os.path.join(d, "b3.parquet"), [("k1", "c", ts(62))],
           ["key", "doc_id", "ts_us"], 4_000_000)
    src = (
        spark.readStream.schema("key string, doc_id string, ts_us long")
        .option("maxFilesPerTrigger", 1).parquet(d)
        .select("key", "doc_id", F.timestamp_micros("ts_us").alias("ts"))
    )
    q = (dedup_stream_within_watermark(src, ("key",), "ts", "5 minutes")
         .writeStream.format("memory").queryName("t_dedup_wm")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = [(r.key, r.doc_id) for r in spark.table("t_dedup_wm").collect()]
    k1_docs = sorted(doc for k, doc in out if k == "k1")
    # the in-window duplicate "b" is dropped; the post-eviction "c" is
    # re-admitted — the bounded-state contract
    assert k1_docs == ["a", "c"]
