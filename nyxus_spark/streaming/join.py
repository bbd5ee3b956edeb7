"""Stream-stream event-time interval join.

The remaining §2.7 shape: TWO unbounded inputs joined on a key plus a
time-range predicate — the streaming twin of `relations.interval_join`
(batch) and the production pattern for "each query event picks up the
candidate events of the last W minutes". Spark buffers both sides in the
state store and, given watermarks + a time-range condition, evicts rows
that can no longer match — bounded state on unbounded streams.

Semantics notes (pinned by tests/test_stream_join.py):

* INNER join emits a pair as soon as both rows have arrived — pairs whose
  members land in DIFFERENT micro-batches are found via the join state, so
  a batch split never loses a boundary pair (the state-carry contract).
* State eviction follows the committed watermark, which lags the progress
  report by one batch (same measured contract as the aggregation drop
  filter, streaming/stream.py) — with a watermark delay comfortably above
  the out-of-orderness plus the lookback, no matchable row is evicted
  early and the streamed result equals the batch join exactly.
* Both sides carry a watermark: without one, the join is still correct but
  the state grows without bound (Spark keeps every row forever) — never
  ship that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    lookback_us: int,
    left_ts_us: str = "ts_us",
    right_ts_us: str = "ts_us",
    delay: str = "2 hours",
) -> DataFrame:
    """Event-time lookback join of two STREAMING DataFrames: for every left
    row, all right rows with the same `key_col` whose event time falls in
    [left_ts − lookback_us, left_ts] (both ends inclusive).

    Timestamps travel as epoch-micros BIGINTs (repo convention); the
    watermark columns are derived with timestamp_micros and kept in the
    output (`l_ts`, `r_ts`) so downstream windowed operators can keep
    chaining on event time. All non-key columns are prefixed `l_` / `r_`
    so the two sides never collide.

    Scale shape: one shuffle per side on the join key; state per key is
    bounded by delay + lookback. A hot key splits the same way any
    stream-stream join does — pre-salt the key upstream if a single key
    dominates (the batch `asof_join(salt_slices=…)` pattern)."""
    if lookback_us <= 0:
        raise ValueError(f"lookback_us must be positive, got {lookback_us}")
    l = left.select(
        F.col(key_col).alias("key"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key_col],
    ).withColumn(
        "l_ts", F.timestamp_micros(F.col(f"l_{left_ts_us}"))
    ).withWatermark("l_ts", delay)
    r = right.select(
        F.col(key_col).alias("r_key"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key_col],
    ).withColumn(
        "r_ts", F.timestamp_micros(F.col(f"r_{right_ts_us}"))
    ).withWatermark("r_ts", delay)
    cond = (
        (l["key"] == r["r_key"])
        & (r[f"r_{right_ts_us}"] >= l[f"l_{left_ts_us}"] - F.lit(lookback_us))
        & (r[f"r_{right_ts_us}"] <= l[f"l_{left_ts_us}"])
    )
    return l.join(r, cond, "inner").drop("r_key")
