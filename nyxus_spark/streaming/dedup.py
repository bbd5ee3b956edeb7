"""Streaming exact dedup — cross-micro-batch key state.

Batch exact dedup (`operators/dedup.exact_dedup`) sees the whole corpus;
a streaming ingest pipeline must drop a re-crawled duplicate that arrived
in an EARLIER micro-batch. Structured Streaming's `dropDuplicates` keeps
per-key state in the state store across batches — exactly the incremental
index `operators/dedup.dedup_incremental` maintains by hand against a
persisted key table, but managed by the engine (checkpointed with the
query, recovered on restart).

Two variants:

* `dedup_stream` — unbounded state: every key ever seen survives exactly
  once, forever. Correct, but the state store grows with the distinct-key
  count; at 100 TB this is the variant you run with a compacted RocksDB
  state store or replace with the `dedup_incremental` + Iceberg-key-index
  pattern.
* `dedup_stream_within_watermark` — bounded state via
  `dropDuplicatesWithinWatermark`: duplicates arriving within the
  watermark delay of the first sighting are dropped; once the watermark
  passes, the key's state is EVICTED and a much-later re-arrival is
  admitted again (the deliberate bounded-state trade — re-crawls separated
  by more than the delay re-enter, and the downstream batch dedup pass
  catches them). tests/test_streaming_dedup.py pins both behaviors,
  including the post-eviction re-admission.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_IN_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("doc_id", StringType()),
    StructField("batch", LongType()),
])

DEDUP_TS_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("doc_id", StringType()),
    StructField("ts", TimestampType()),
])


def dedup_stream(src: DataFrame, key_cols: Iterable[str] = ("key",)) -> DataFrame:
    """Exact streaming dedup with unbounded per-key state: the first
    arrival of each key (across ALL micro-batches) survives; every later
    duplicate — same batch or any later one — is dropped by the state
    store."""
    return src.dropDuplicates(list(key_cols))


def dedup_stream_within_watermark(
    src: DataFrame,
    key_cols: Iterable[str] = ("key",),
    ts_col: str = "ts",
    delay: str = "10 seconds",
) -> DataFrame:
    """Bounded-state streaming dedup: duplicates within `delay` of the
    first sighting (by event time) are dropped; keys older than the
    watermark are evicted, so a re-arrival after eviction is ADMITTED —
    the documented contract callers must compose with a batch dedup pass
    when exactness beyond the window is required."""
    return src.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
