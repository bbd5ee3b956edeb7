"""Entity-relation operators: neighbor self-join, parent-child rollups, and
label filtering — Spark recasts of the reference's join-like semantics
(SURVEY.md §2.4 J2/J3, §2.2 F2-F4).

* neighbor self-join (J2) — nyxus finds ROI pairs whose contours are within
  radius R via an AABB broad phase + exact narrow phase
  (/root/reference/src/nyx/features/neighbors.cpp:67-123). The 1-D temporal
  recast: two doc versions are "neighbors" when their timestamps fall within
  R seconds. Broad phase = time-bucket join on bucket ± 1 (each row lands in
  one bucket, candidates share adjacent buckets), narrow phase = exact |Δt|
  filter — the classic range-join plan that avoids a full cross product.

* parent-child rollup (J3) — nyxus aggregates child-ROI features onto parent
  ROIs (src/nyx/nested_roi.cpp, nyxus.py:2274-2310) with SUM/MEAN/MIN/MAX/WMA
  (src/nyx/nested_feature_aggregation.h:6). Here: child = sequence version,
  parent = doc (or source); aggregation = groupBy + pivot.

* whitelist/blacklist (F2/F3) — label filters applied before feature math
  (src/nyx/phase2_2d.cpp:96-98, roi_blacklist.cpp): left-semi / left-anti
  joins against a (broadcast) id set.

* label merge (F4) — mergeLabels / wholeslide collapse (src/nyx/phase1.cpp:
  66-77): projection rewriting doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyxus_spark.compare import fround4


def neighbor_pairs(
    df: DataFrame,
    radius_sec: float,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Pairs of rows of the same key within `radius_sec` of each other.

    Broad phase: bucket by floor(ts/R) and join each row's bucket against
    {b-1, b, b+1}; narrow phase: exact |Δt| ≤ R. Shuffles on (key, bucket) —
    never a cross product, robust to skew via AQE.
    """
    id_cols = id_cols or ["event_id"]
    secs = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    base = df.select(
        key_col, ts_col, *id_cols, F.floor(secs / F.lit(radius_sec)).alias("__b")
    )
    left = base.select(
        key_col,
        F.col(ts_col).alias("ts_a"),
        *[F.col(c).alias(f"{c}_a") for c in id_cols],
        F.explode(F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)).alias("__b"),
    )
    right = base.select(
        key_col,
        F.col(ts_col).alias("ts_b"),
        *[F.col(c).alias(f"{c}_b") for c in id_cols],
        "__b",
    )
    da = F.unix_micros(F.col("ts_a").cast("timestamp"))
    db = F.unix_micros(F.col("ts_b").cast("timestamp"))
    return (
        left.join(right, [key_col, "__b"])
        .filter((F.col(f"{id_cols[0]}_a") < F.col(f"{id_cols[0]}_b")))
        .filter(F.abs(da - db) <= F.lit(int(radius_sec * 1e6)))
        .drop("__b")
        .dropDuplicates([f"{id_cols[0]}_a", f"{id_cols[0]}_b"])
    )


def neighbor_stats(
    df: DataFrame,
    radius_sec: float,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-row neighbor features: NUM_NEIGHBORS + distance to closest 1/2
    (neighbors.cpp:125-245 analog: NUM_NEIGHBORS, CLOSEST_NEIGHBOR1/2_DIST)."""
    pairs = neighbor_pairs(df, radius_sec, key_col, ts_col, [id_col])
    da = F.unix_micros(F.col("ts_a").cast("timestamp"))
    db = F.unix_micros(F.col("ts_b").cast("timestamp"))
    # exact integer microseconds: rounding fractional seconds hits .5-boundary
    # decimals where Spark (BigDecimal HALF_UP) and float-based engines disagree
    dist = F.abs(da - db).alias("dist_us")
    sym = pairs.select(F.col(f"{id_col}_a").alias(id_col), dist).unionByName(
        pairs.select(F.col(f"{id_col}_b").alias(id_col), dist)
    )
    # top-2 via rank, not collect_list: the per-event neighbor set is bounded
    # by the radius window, but a sort-based rank keeps memory STRICTLY
    # bounded (Tungsten sort spills) even under pathological clustering —
    # no per-group array ever materializes
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("dist_us").asc())
    ranked = sym.withColumn("__rn", F.row_number().over(w))
    agg = ranked.groupBy(id_col).agg(
        F.count("*").alias("num_neighbors"),
        F.max(F.when(F.col("__rn") == 1, F.col("dist_us"))).alias("closest1_us"),
        F.max(F.when(F.col("__rn") == 2, F.col("dist_us"))).alias("closest2_us"),
    )
    return df.select(key_col, ts_col, id_col).join(agg, id_col, "left").fillna(
        {"num_neighbors": 0}
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "doc_id",
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Temporal interval (range) join: each point row matched to every
    interval row of the same key with start ≤ ts ≤ end — the event-into-
    session / point-into-validity-window shape the as-of join does not
    cover (as-of picks ONE version; an interval join yields ALL containing
    windows).

    Default plan: equi-join on the key + range filter — the right call when
    per-key row counts are bounded (AQE handles skew). With
    ``bucket_seconds=B`` the broad phase joins on (key, time-bucket)
    instead: each interval explodes into the ⌈len/B⌉ buckets it covers
    while each point carries its single bucket, so the join never expands
    beyond candidates within B seconds — the scale path when single keys
    hold long histories. Each (point, interval) match appears exactly once
    (a point's bucket is unique). Guard: Spark's sequence(a, b) DESCENDS
    when b < a, so bucket ranges are built with floor(start) ≤ floor(end),
    which interval validity (start ≤ end) guarantees.
    """
    p_ts = F.unix_micros(F.col(ts_col).cast("timestamp"))
    i_lo = F.unix_micros(F.col(start_col).cast("timestamp"))
    i_hi = F.unix_micros(F.col(end_col).cast("timestamp"))
    within = (F.col("__pts") >= F.col("__ilo")) & (F.col("__pts") <= F.col("__ihi"))
    pts = points.withColumn("__pts", p_ts)
    ivs = intervals.withColumn("__ilo", i_lo).withColumn("__ihi", i_hi)
    if bucket_seconds is None:
        out = pts.join(ivs.withColumnRenamed(on, f"__{on}"),
                       (F.col(on) == F.col(f"__{on}")) & within)
        return out.drop(f"__{on}", "__pts", "__ilo", "__ihi")
    b_us = int(bucket_seconds * 1_000_000)
    pts = pts.withColumn("__bk", F.expr(f"__pts div {b_us}"))
    ivs = ivs.withColumn(
        "__bkr", F.explode(F.expr(f"sequence(__ilo div {b_us}, __ihi div {b_us})"))
    ).withColumnRenamed(on, f"__{on}")
    out = pts.join(ivs, (F.col(on) == F.col(f"__{on}"))
                   & (F.col("__bk") == F.col("__bkr")) & within)
    return out.drop(f"__{on}", "__pts", "__ilo", "__ihi", "__bk", "__bkr")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: float = 3600.0,
    rsuffix: str = "_r",
) -> DataFrame:
    """Interval×interval OVERLAP join: every (left, right) pair whose
    validity windows intersect (l.start ≤ r.end AND r.start ≤ l.end,
    boundaries inclusive) — the span-overlap primitive behind co-activity
    windows, decontamination span intersection, and downtime attribution.
    The point-into-interval case is `interval_join`; this is the
    two-sided generalization.

    Plan (scale path): both sides explode their intervals into the
    ⌈len/B⌉ time buckets they cover and equi-join on the bucket — never a
    cartesian. Each qualifying pair is emitted EXACTLY ONCE without a
    dedup shuffle: the join keeps only the bucket containing
    max(l.start, r.start) — the first bucket of the intersection, which
    floor-monotonicity makes max(bucket(l.start), bucket(r.start)) — a
    bucket both sides cover iff the intervals overlap.

    Right columns come back renamed with `rsuffix`. Guard: Spark's
    sequence(a, b) DESCENDS when b < a; interval validity (start ≤ end)
    keeps every bucket range ascending."""
    b_us = int(bucket_seconds * 1_000_000)
    lo = F.unix_micros(F.col(start_col).cast("timestamp"))
    hi = F.unix_micros(F.col(end_col).cast("timestamp"))
    l = (
        left.withColumn("__llo", lo).withColumn("__lhi", hi)
        .withColumn(
            "__bk", F.explode(F.expr(f"sequence(__llo div {b_us}, __lhi div {b_us})"))
        )
    )
    r = right.select(
        *[F.col(c).alias(f"{c}{rsuffix}") for c in right.columns]
    )
    rlo = F.unix_micros(F.col(f"{start_col}{rsuffix}").cast("timestamp"))
    rhi = F.unix_micros(F.col(f"{end_col}{rsuffix}").cast("timestamp"))
    r = (
        r.withColumn("__rlo", rlo).withColumn("__rhi", rhi)
        .withColumn(
            "__rbk", F.explode(F.expr(f"sequence(__rlo div {b_us}, __rhi div {b_us})"))
        )
    )
    overlap = (F.col("__llo") <= F.col("__rhi")) & (F.col("__rlo") <= F.col("__lhi"))
    first_shared = F.col("__bk") == F.greatest(
        F.expr(f"__llo div {b_us}"), F.expr(f"__rlo div {b_us}")
    )
    out = l.join(r, (F.col("__bk") == F.col("__rbk")) & overlap & first_shared)
    return out.drop("__llo", "__lhi", "__bk", "__rlo", "__rhi", "__rbk")


def rollup_parent(
    child: DataFrame,
    parent_key: str,
    value_cols: list[str],
    aggs: list[str] = ["sum", "mean", "min", "max"],
    weight_col: str | None = None,
) -> DataFrame:
    """Parent-child nested aggregation (J3): one row per parent with
    {agg}_{col} columns — the full SUM/MEAN/MIN/MAX/WMA set of
    nested_feature_aggregation.h:6 plus count. "wma" is the area-weighted
    mean (child weight = `weight_col`, the ROI-area analog — here n_tok)."""
    if "wma" in aggs and weight_col is None:
        raise ValueError("wma aggregation needs weight_col (the child area analog)")
    exprs = [F.count("*").alias("n_children")]
    for c in value_cols:
        for a in aggs:
            if a == "wma":
                w = F.col(weight_col).cast("double")
                exprs.append(
                    fround4(F.sum(F.col(c).cast("double") * w) / F.sum(w)).alias(f"wma_{c}")
                )
                continue
            fn = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}[a]
            exprs.append(fround4(fn(c).cast("double")).alias(f"{a}_{c}"))
    return child.groupBy(parent_key).agg(*exprs)


def rollup_pivot(
    child: DataFrame,
    parent_key: str,
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
) -> DataFrame:
    """Pivot-style rollup (nyxus.py:2274-2310 pivot_table path)."""
    fn = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max, "count": F.count}[agg]
    return child.groupBy(parent_key).pivot(pivot_col).agg(fround4(fn(value_col).cast("double")))


def filter_whitelist(df: DataFrame, ids: DataFrame | list, key_col: str = "doc_id") -> DataFrame:
    """F2: keep only whitelisted keys (broadcast left-semi join)."""
    if isinstance(ids, list):
        return df.filter(F.col(key_col).isin(ids))
    return df.join(F.broadcast(ids), key_col, "left_semi")


def filter_blacklist(df: DataFrame, ids: DataFrame | list, key_col: str = "doc_id") -> DataFrame:
    """F3: drop blacklisted keys (broadcast left-anti join)."""
    if isinstance(ids, list):
        return df.filter(~F.col(key_col).isin(ids))
    return df.join(F.broadcast(ids), key_col, "left_anti")


def merge_labels(df: DataFrame, key_col: str = "doc_id", merged: str = "__merged__") -> DataFrame:
    """F4: collapse all entities into one label (wholeslide mode analog)."""
    return df.withColumn(key_col, F.lit(merged))
