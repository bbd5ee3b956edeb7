"""Windowed temporal operators: lag/lead, LOCF backfill, gap sessionization.

Spark-first equivalents of the reference's ordered-traversal semantics
(SURVEY.md §2.5): deterministic label ordering (phase2_2d.cpp:97-98) becomes
Window.partitionBy(key).orderBy(ts); the 2.5-D carry-forward of per-z state
(/root/reference/src/nyx/phase1.cpp:130-242) becomes
last(col, ignorenulls=True) over unbounded-preceding rows (LOCF); t_index
slicing (src/nyx/constants.h:3) becomes event-time sessionization.

All pure Catalyst window functions — single shuffle on the partition key,
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(partition: str, order: str) -> Window:
    return Window.partitionBy(partition).orderBy(F.col(order).asc())


def _secs(col):
    """Event-time column → epoch seconds (works for TIMESTAMP and TIMESTAMP_NTZ)."""
    return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)


def with_lags(
    df: DataFrame,
    cols: list[str],
    offsets: list[int] = [1],
    partition: str = "doc_id",
    order: str = "ts",
    leads: bool = True,
) -> DataFrame:
    """Append lag_{col}_{k} (and lead_{col}_{k}) columns."""
    w = _w(partition, order)
    out = df
    for c in cols:
        for k in offsets:
            out = out.withColumn(f"lag_{c}_{k}", F.lag(c, k).over(w))
            if leads:
                out = out.withColumn(f"lead_{c}_{k}", F.lead(c, k).over(w))
    return out


def with_locf(
    df: DataFrame,
    cols: list[str],
    partition: str = "doc_id",
    order: str = "ts",
    suffix: str = "_locf",
) -> DataFrame:
    """Last-observation-carried-forward backfill of nullable columns."""
    w = _w(partition, order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def sessionize(
    df: DataFrame,
    gap_seconds: float,
    partition: str = "doc_id",
    order: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts where the time since the
    previous event of the same key exceeds `gap_seconds`.

    session_id is a per-key 0-based ordinal (cumulative sum of new-session
    flags) — the classic gaps-and-islands plan: one shuffle, one sort.
    """
    w = _w(partition, order)
    prev_ts = F.lag(order).over(w)
    new_sess = F.when(
        prev_ts.isNull() | ((_secs(F.col(order)) - _secs(prev_ts)) > F.lit(float(gap_seconds))),
        1,
    ).otherwise(0)
    cum = Window.partitionBy(partition).orderBy(F.col(order).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", new_sess).withColumn(
        session_col, F.sum("__new").over(cum) - F.lit(1)
    ).drop("__new")
