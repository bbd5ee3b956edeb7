"""Prescan pass + dataset-range features.

Recast of the reference's prescan (one cheap pass per slide computing global
min/max intensity before any per-ROI work — /root/reference/src/nyx/
workflow_2d_segmented.cpp:175-205, slideprops.h:6-76): a groupBy("source")
aggregate materialized as a tiny dim table and broadcast-joined back, giving
per-row access to dataset-level extrema exactly like SlideProps gives nyxus
kernels the slide intensity range.

COVERED_IMAGE_INTENSITY_RANGE (src/nyx/features/intensity.cpp:104-109):
(roi_max − roi_min) / (slide_max − slide_min), recast per (sequence, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_ranges(df: DataFrame, source_col: str = "source", tokens_col: str = "tokens") -> DataFrame:
    """The prescan dim table: per-source token extrema and volume."""
    return df.groupBy(source_col).agg(
        F.min(F.array_min(tokens_col)).alias("src_min"),
        F.max(F.array_max(tokens_col)).alias("src_max"),
        F.count("*").alias("src_rows"),
        F.sum(F.size(tokens_col)).alias("src_tokens"),
    )


def with_source_range(df: DataFrame, source_col: str = "source", tokens_col: str = "tokens") -> DataFrame:
    """Broadcast-join the prescan ranges onto every row."""
    dim = source_ranges(df, source_col, tokens_col)
    return df.join(F.broadcast(dim), source_col)


def covered_range_col(tokens_col: str = "tokens"):
    """COVERED_IMAGE_INTENSITY_RANGE column (needs with_source_range first)."""
    rng = F.array_max(tokens_col) - F.array_min(tokens_col)
    srng = F.col("src_max") - F.col("src_min")
    return (rng.cast("double") / srng.cast("double")).alias("COVERED_IMAGE_INTENSITY_RANGE")
