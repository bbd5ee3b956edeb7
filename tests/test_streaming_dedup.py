"""Streaming exact dedup (streaming/stream.py dedup_stream).

First-arrival-wins across micro-batches; the within-watermark variant keeps
bounded state (eviction) at the price of the arrival-distance guarantee.
"""

import os

import pytest

from nyxus_spark.streaming import dedup_stream


def _replay(spark, tmp_path, batches, schema):
    import pandas as pd

    d = str(tmp_path / "stream")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        f = os.path.join(d, f"part-{i:03d}.parquet")
        pd.DataFrame(rows).to_parquet(f)
        os.utime(f, (1_000_000 * (i + 1), 1_000_000 * (i + 1)))
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )


def test_dedup_stream_unbounded_state(spark, tmp_path):
    """No-watermark mode: exact at ANY arrival distance — in-batch dups,
    cross-batch dups, and value-carrying first arrivals all resolved."""
    batches = [
        [{"k": 1, "v": "a1"}, {"k": 2, "v": "b1"}, {"k": 1, "v": "a2"}],
        [{"k": 3, "v": "c1"}, {"k": 2, "v": "b2"}, {"k": 1, "v": "a3"}],
    ]
    src = _replay(spark, tmp_path, batches, "k long, v string")
    q = (
        dedup_stream(src, ["k"])
        .writeStream.format("memory")
        .queryName("dedup_unbounded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["k"]: r["v"] for r in spark.sql("SELECT * FROM dedup_unbounded").collect()}
    assert rows == {1: "a1", 2: "b1", 3: "c1"}  # first arrival wins


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Watermarked mode: duplicates arriving within the delay are dropped;
    state is evictable (the unbounded-stream shape)."""
    t0 = 1_700_000_000_000_000  # epoch micros
    s = 1_000_000
    batches = [
        [{"k": 10, "ts_us": t0}, {"k": 11, "ts_us": t0 + 5 * s},
         {"k": 10, "ts_us": t0 + 10 * s}],           # in-batch dup
        [{"k": 11, "ts_us": t0 + 60 * s},            # cross-batch dup, close
         {"k": 12, "ts_us": t0 + 70 * s}],
    ]
    import pandas as pd  # noqa: F401

    src = _replay(spark, tmp_path, batches, "k long, ts_us long")
    from pyspark.sql import functions as F

    withts = src.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    q = (
        dedup_stream(withts, ["k"], ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ks = [r["k"] for r in spark.sql("SELECT k FROM dedup_wm").collect()]
    assert sorted(ks) == [10, 11, 12]


def test_dedup_stream_validation(spark):
    with pytest.raises(ValueError, match="ts_col"):
        dedup_stream(spark.range(1), ["id"], watermark="1 hour")
