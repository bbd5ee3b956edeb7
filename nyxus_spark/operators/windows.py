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


def with_nocb(
    df: DataFrame,
    cols: list[str],
    partition: str = "doc_id",
    order: str = "ts",
    suffix: str = "_nocb",
) -> DataFrame:
    """Next-observation-carried-BACKWARD — `with_locf`'s time-reversed
    twin (the leading-edge backfill a feature table needs for entities
    whose first observations arrive late)."""
    w = _w(partition, order).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.first(c, ignorenulls=True).over(w))
    return out


def with_time_interp(
    df: DataFrame,
    col: str,
    partition: str = "doc_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    suffix: str = "_interp",
) -> DataFrame:
    """Event-TIME-weighted linear interpolation fill — the third member of
    the backfill family: a null between two observations gets
    v0 + (v1 − v0)·((t − t0)/(t1 − t0)) with (v0, t0) the previous and
    (v1, t1) the next non-null observation by event time (epoch micros).
    Nulls before the first / after the last observation fall back to
    NOCB / LOCF respectively; a null exactly at an observation timestamp
    (t1 = t0 cannot happen between DISTINCT observations, but ties at the
    boundary can) takes v0.

    Determinism contract: the interpolation is the FIXED IEEE chain
    v0 + ((v1 − v0) · (Δ/D)) — two exact-bigint time differences, one
    division, one multiply, one add — replayed op-for-op by the oracle;
    window order is tie-broken on `tiebreak`. Two partitioned windows on
    the same sort — one Exchange in the plan."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = Window.partitionBy(partition).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc())
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    c = F.col(col)
    v0 = F.last(c, ignorenulls=True).over(wb).cast("double")
    t0 = F.last(F.when(c.isNotNull(), us), ignorenulls=True).over(wb)
    v1 = F.first(c, ignorenulls=True).over(wf).cast("double")
    t1 = F.first(F.when(c.isNotNull(), us), ignorenulls=True).over(wf)
    interp = (
        F.when(c.isNotNull(), c.cast("double"))
        .when(v0.isNull(), v1)
        .when(v1.isNull(), v0)
        .when(t1 == t0, v0)
        .otherwise(
            v0 + (v1 - v0) * ((us - t0).cast("double") / (t1 - t0).cast("double"))
        )
    )
    return df.withColumn(f"{col}{suffix}", interp)


def with_rolling(
    df: DataFrame,
    col: str,
    n_rows: int | None = None,
    range_us: int | None = None,
    partition: str = "doc_id",
    order: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Rolling-window aggregates (sum/count/min/max) of `col` — the classic
    point-in-time feature frames:

    * ``n_rows=K``: the last K rows (ROWS BETWEEN K−1 PRECEDING AND CURRENT
      ROW). Row frames are only deterministic under a TOTAL order, so pass
      ``tiebreak`` (e.g. an event id) when the order column can tie.
    * ``range_us=S``: event-time range frame over the last S microseconds
      (RANGE BETWEEN S PRECEDING AND CURRENT ROW on epoch-µs) — immune to
      ties by construction.

    Appends ``roll{K}_{agg}_{col}`` / ``rollr{S}us_{agg}_{col}``. One
    shuffle on the partition key; both frames run whole-stage in the JVM.
    Nulls in `col` are skipped by sum/min/max and excluded from count —
    identical semantics in ANSI SQL, which keeps the columns oracle-exact
    when `col` is an exact integer (cents, counts).
    """
    if n_rows is None and range_us is None:
        raise ValueError("pass n_rows and/or range_us")
    if n_rows is not None and n_rows <= 0:
        raise ValueError(f"n_rows must be positive, got {n_rows}")
    if range_us is not None and range_us <= 0:
        raise ValueError(f"range_us must be positive, got {range_us}")
    out = df
    aggs = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    if n_rows is not None:
        ob = [F.col(order).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
        w = (Window.partitionBy(partition).orderBy(*ob)
             .rowsBetween(-(n_rows - 1), 0))
        for name, fn in aggs.items():
            out = out.withColumn(f"roll{n_rows}_{name}_{col}", fn(col).over(w))
    if range_us is not None:
        wr = (Window.partitionBy(partition)
              .orderBy(F.unix_micros(F.col(order).cast("timestamp")).asc())
              .rangeBetween(-range_us, 0))
        for name, fn in aggs.items():
            out = out.withColumn(f"rollr{range_us}us_{name}_{col}", fn(col).over(wr))
    return out


def with_rolling_median(
    df: DataFrame,
    col: str,
    n_rows: int,
    partition: str = "doc_id",
    order: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact LOWER-median over the trailing `n_rows` row frame — the robust
    rolling baseline (outlier-immune where the rolling mean is not). The
    median is the element at rank (c+1) div 2 of the sorted non-null frame
    values (c = non-null count; rank rule matches prescan's lower median);
    an all-null/empty frame yields NULL.

    collect_list skips nulls, array_sort + element_at pick the rank — all
    whole-stage JVM, O(w log w) per row over the same ONE partition-key
    shuffle as the other rolling frames (w is a small constant; this is not
    for unbounded frames). element_at is EAGER under ANSI, so the index is
    clamped to >= 1 and the empty case dispatched by the surrounding CASE.

    Appends ``roll{n_rows}_med_{col}`` (long).
    """
    if n_rows <= 0:
        raise ValueError(f"n_rows must be positive, got {n_rows}")
    ob = [F.col(order).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = (Window.partitionBy(partition).orderBy(*ob)
         .rowsBetween(-(n_rows - 1), 0))
    out = df.withColumn("__rmarr", F.array_sort(F.collect_list(F.col(col)).over(w)))
    c = F.size("__rmarr")
    med = F.when(
        c > 0,
        F.element_at(
            F.col("__rmarr"),
            F.greatest(F.expr("cast((size(__rmarr) + 1) div 2 as int)"), F.lit(1)),
        ),
    )
    out = out.withColumn(f"roll{n_rows}_med_{col}", med.cast("long"))
    # frame MAD: lower median of |x − med| over the SAME collected array —
    # the robust spread to pair with the robust level (one more transform
    # + sort on the staged frame, no extra window)
    mcol = f"roll{n_rows}_med_{col}"
    mad = F.when(
        c > 0,
        F.element_at(
            F.array_sort(F.expr(f"transform(__rmarr, x -> abs(x - {mcol}))")),
            F.greatest(F.expr("cast((size(__rmarr) + 1) div 2 as int)"), F.lit(1)),
        ),
    )
    return (
        out.withColumn(f"roll{n_rows}_mad_{col}", mad.cast("long"))
        .drop("__rmarr")
    )


def with_decayed_counter(
    df: DataFrame,
    col: str,
    half_life_us: int,
    n_rows: int = 32,
    age_cap: int = 20,
    partition: str = "doc_id",
    order: str = "ts",
    tiebreak: str | None = None,
    label: str | None = None,
) -> DataFrame:
    """Time-decayed counter — the classic feature-store primitive (a CTR /
    activity feature where each past observation's weight halves every
    `half_life_us` of event time), made EXACT and engine-reproducible:

    * the decay weight is the dyadic 2^(−age) with
      age = min((t_now − t_i) div half_life_us, age_cap) — integer-bucketed
      half-lives instead of the float 2^(−Δt/h) recurrence, so the 2^age_cap-
      scaled numerator Σ vᵢ·2^(age_cap−ageᵢ) is an exact BIGINT any engine
      reproduces (observations older than age_cap half-lives contribute 0 —
      at the default cap their true weight is < 1e-6);
    * the history is the trailing `n_rows` row frame (tie-broken total
      order), the bounded-state shape the streaming counter keeps — O(K)
      work per row over ONE partition-key shuffle, never an unbounded
      rescan;
    * the feature value is numerator / 2^age_cap — ONE IEEE division by a
      power of two.

    Appends ``{label}_num_{col}`` (exact BIGINT numerator), ``{label}_n_{col}``
    (non-null observations in frame) and ``{label}_{col}`` (double); label
    defaults to ``dk{half_life_us//60_000_000}m``. Overflow bound: needs
    n_rows · max|v| · 2^age_cap < 2^63 (n_rows=32, age_cap=20 → |v| ≤ ~2.7e11).

    Reference analog: nyxus accumulates per-label running state across an
    ordered pixel scan (phase1.cpp online statistics); the decayed counter is
    that online-state shape on the event-time axis.
    """
    if half_life_us <= 0 or n_rows <= 0:
        raise ValueError("half_life_us and n_rows must be positive")
    if not (0 <= age_cap <= 62):
        raise ValueError(f"age_cap must be in [0, 62], got {age_cap}")
    lbl = label if label is not None else f"dk{half_life_us // 60_000_000}m"
    ob = [F.col(order).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = (Window.partitionBy(partition).orderBy(*ob)
         .rowsBetween(-(n_rows - 1), 0))
    us = f"__dk_us_{lbl}"
    arr = f"__dk_arr_{lbl}"
    out = (
        df.withColumn(us, F.unix_micros(F.col(order).cast("timestamp")))
        .withColumn(
            arr,
            F.collect_list(
                F.struct(F.col(us).alias("u"), F.col(col).cast("long").alias("v"))
            ).over(w),
        )
    )
    # exact integer fold over the staged frame: the trailing frame ends at
    # the current row, so t_now − x.u ≥ 0 and the shift stays in [0, age_cap]
    num = F.expr(
        f"aggregate({arr}, cast(0 as bigint), (a, x) -> a + CASE WHEN x.v IS "
        f"NULL THEN cast(0 as bigint) ELSE x.v * shiftleft(cast(1 as bigint), "
        f"{age_cap} - cast(least(({us} - x.u) div {half_life_us}, {age_cap}) "
        f"as int)) END)"
    )
    nn = F.expr(f"size(filter({arr}, x -> x.v IS NOT NULL))").cast("long")
    return (
        out.withColumn(f"{lbl}_num_{col}", num)
        .withColumn(f"{lbl}_n_{col}", nn)
        .withColumn(
            f"{lbl}_{col}",
            F.col(f"{lbl}_num_{col}").cast("double") / F.lit(float(1 << age_cap)),
        )
        .drop(us, arr)
    )


def temporal_group_split(
    df: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal GROUP split — the leakage-free backtest split (the split
    discipline behind the north rule's zero-temporal-leakage contract):

    * T = the corpus LOWER-MEDIAN event time (exact rank rule — smallest
      timestamp whose cumulative row count reaches (N+1) div 2 — over a
      value-grain aggregation + dim-sized cumulative window, engine-exact);
    * a key whose FIRST event is after T is a TEST key (all its rows test:
      entities unseen in training, the group-disjointness half);
    * other keys' rows at or before T are TRAIN; their rows after T are
      DROPPED — the leakage-prone tail a naive random split would leak.

    Adds ``split_T_us`` (corpus constant), ``key_first_us``, and ``tsplit``
    (0 train / 1 dropped / 2 test). One key-grain aggregation + one
    broadcast constant; deterministic forever given the corpus."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = df.withColumn("__tgs_us", us)
    vc = d.groupBy(F.col("__tgs_us").alias("__v")).agg(
        F.count("*").cast("long").alias("__c")
    )
    wcum = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    vc = vc.withColumn("__cum", F.sum("__c").over(wcum).cast("long")).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy()).cast("long")
    )
    t = vc.agg(
        F.min(
            F.when(F.col("__cum") >= F.expr("(__n + 1) div 2"), F.col("__v"))
        ).cast("long").alias("split_T_us")
    )
    first = d.groupBy(key_col).agg(
        F.min("__tgs_us").cast("long").alias("key_first_us")
    )
    out = d.join(first, key_col).crossJoin(F.broadcast(t))
    return out.withColumn(
        "tsplit",
        F.when(F.col("key_first_us") > F.col("split_T_us"), F.lit(2))
        .when(F.col("__tgs_us") <= F.col("split_T_us"), F.lit(0))
        .otherwise(F.lit(1)).cast("long"),
    ).drop("__tgs_us")


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


def scd2_intervals(df, key_col: str = "doc_id", ts_col: str = "ts",
                   tiebreak: str = "event_id",
                   open_end_us: int = 9223372036854775807):
    """Slowly-Changing-Dimension type-2 validity intervals — the lakehouse
    history-table builder: each version row of a key gets
    [valid_from_us, valid_to_us) with valid_to = the NEXT version's
    timestamp (epoch micros — the repo's cross-engine timestamp currency)
    and the open (current) version capped at `open_end_us`; `scd_current`
    flags it. An as-of lookup at time t is then a plain range predicate
    valid_from_us <= t < valid_to_us — the join `asof_join` answers with a
    window instead; materializing SCD2 trades storage for O(1) interval
    predicates and is the standard dimension-table shape (Kimball).

    One partitioned window per key (scale-safe: the shuffle is on the key,
    versions per key are bounded); deterministic under timestamp ties via
    `tiebreak`. Adds scd_from_us, scd_to_us (exact bigints), scd_current
    (0/1)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc())
    nxt = F.lead(us).over(w)
    return (
        df.withColumn("scd_from_us", us.cast("long"))
        .withColumn("scd_to_us",
                    F.coalesce(nxt, F.lit(open_end_us)).cast("long"))
        .withColumn("scd_current", nxt.isNull().cast("long"))
    )


def with_cusum(df, value_col: str, ref_col: str,
               partition_col: str, order_col: str):
    """One-sided CUSUM changepoint statistics (Page 1954) over a
    per-partition time order — the sequential level-shift detector beside
    the |x−med| > k·MAD point-outlier flag: c⁺ accumulates upward drift
    (c⁺_t = max(0, c⁺_{t−1} + (x_t − ref))), c⁻ downward, and a sustained
    shift grows them linearly where isolated spikes decay back to 0.

    Exact BIGINT arithmetic, and NO sequential fold to replay: the
    recursion has the closed form

        c⁺_t = S_t − min(0, min_{j≤t} S_j),   S = prefix sums of (x − ref)

    so both statistics are pure window expressions (one running sum + one
    running min per side) any engine reproduces bit-for-bit. `ref_col`
    must be an exact integer reference (e.g. the gated per-group median).

    Adds cusum_pos / cusum_neg columns. Scale shape: two window passes on
    the same (partition, order) — one Exchange, reused."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d_pos = (F.col(value_col) - F.col(ref_col)).cast("long")
    s_pos = F.sum(d_pos).over(w)
    s_neg = F.sum(-d_pos).over(w)
    return (
        df.withColumn(
            "cusum_pos",
            (s_pos - F.least(F.lit(0).cast("long"), F.min(s_pos).over(w)))
            .cast("long"),
        )
        .withColumn(
            "cusum_neg",
            (s_neg - F.least(F.lit(0).cast("long"), F.min(s_neg).over(w)))
            .cast("long"),
        )
    )


def cohort_retention(df, user_col: str = "doc_id", ts_col: str = "ts"):
    """User COHORT-RETENTION rollup — the product-analytics primitive over
    the event stream: each user's cohort is their FIRST-activity day;
    cell (cohort_day, offset_day) counts the distinct cohort members
    active offset days later. Exact integers throughout (epoch-µs → day
    via integer division).

    Returns two DataFrames:
      per_user: (user, cohort_d)
      cells:    (cohort_d, offset_d, cell_users) plus cohort_users
                (the cohort's size, offset 0 row count by construction)

    Scale shape: one distinct (user, day) agg, one min-per-user agg
    (map-side combinable), one (cohort, offset) count — all hash aggs,
    no windows, no skew beyond the natural cohort sizes."""
    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        / F.lit(86_400_000_000)
    ).cast("long")
    base = df.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    first = base.groupBy("u").agg(F.min("d").alias("cohort_d"))
    act = base.join(first, "u").select(
        "u", "cohort_d", (F.col("d") - F.col("cohort_d")).alias("offset_d"))
    csize = first.groupBy("cohort_d").agg(
        F.count("*").cast("long").alias("cohort_users"))
    cells = (
        act.groupBy("cohort_d", "offset_d")
        .agg(F.countDistinct("u").cast("long").alias("cell_users"))
        .join(csize, "cohort_d")
    )
    return first, cells


def funnel_stages(
    df,
    steps: list[str],
    user_col: str = "doc_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered FUNNEL analysis — the product-analytics sequence matcher
    Spark has no native operator for: per user, the earliest time each
    step of `steps` completes STRICTLY AFTER the previous step (classic
    view → click → purchase conversion). A user's funnel_stage is the
    number of steps completed in order; step k's timestamp is

        t_k = min{ ts : type = steps[k], ts > t_{k−1} }

    — each step ONE filtered conditional-min hash aggregation joined on
    the previous step's time, so the whole funnel is len(steps) exact
    epoch-µs aggregations (no window sort, no per-row state). Strictly
    increasing times: two steps can never share one event.

    Returns (user_col, f_ts_0.., funnel_stage) with −1 sentinels for
    uncompleted steps. Scale shape: k hash aggs over the per-step slices,
    each map-side combinable; skew = the natural per-user event counts."""
    if not steps:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(user_col).alias("u"), us.alias("__us"),
        F.col(type_col).alias("__ty"),
    )
    out = None
    for k, st in enumerate(steps):
        ev_k = base.filter(F.col("__ty") == st)
        if k == 0:
            stepk = ev_k.groupBy("u").agg(
                F.min("__us").cast("long").alias(f"f_ts_{k}"))
            out = stepk
        else:
            prev = out.filter(F.col(f"f_ts_{k-1}").isNotNull())
            stepk = (
                ev_k.join(prev.select("u", f"f_ts_{k-1}"), "u")
                .filter(F.col("__us") > F.col(f"f_ts_{k-1}"))
                .groupBy("u")
                .agg(F.min("__us").cast("long").alias(f"f_ts_{k}"))
            )
            out = out.join(stepk, "u", "left")
    stage = None
    for k in range(len(steps)):
        c = F.col(f"f_ts_{k}").isNotNull().cast("long")
        stage = c if stage is None else stage + c
    return out.select(
        F.col("u").alias(user_col),
        *[
            F.coalesce(F.col(f"f_ts_{k}"), F.lit(-1).cast("long"))
            .alias(f"f_ts_{k}")
            for k in range(len(steps))
        ],
        stage.cast("long").alias("funnel_stage"),
    )


def interarrival_stats(df, key_col: str = "doc_id", ts_col: str = "ts"):
    """Per-key inter-arrival point-process diagnostics over the event stream
    — the temporal-texture analog of the reference's per-ROI ordered
    statistics (phase2_2d.cpp ordered traversal), and the per-entity
    burstiness profile a 100 TB pipeline computes before sessionizing.

    Gaps are floor(Δts/1s) BIGINTs (exact; ties in ts are harmless — the
    consecutive-difference VALUE sequence depends only on the sorted ts
    multiset). Every aggregate is an exact int64 sum, and each float output
    is one affine/sqrt map of those ints, so a SQL oracle replays them
    bit-identically (integer-numerator discipline):

      ia_burstiness  Goh–Barabási B = (√K − S)/(√K + S), K = G·Q − S²
      ia_memory      lag-1 Pearson of consecutive gaps,
                     (m·P − Sa·Sb)/(√K₁·√K₂) on the exact cross-sums
      ia_fano_hourly Fano factor of hourly counts over the ACTIVE span
                     [min_hour, max_hour]: (nh·Σc² − n²)/(nh·n)

    Overflow bound: |gap| ≤ ~5.1e5 s at sf0.1 ⇒ G·Q ≤ ~2.3e13 ≪ 2⁶³; the
    bound scales with per-key event count × span², not corpus size.

    Scale shape: ONE shuffle on the key (window + groupBy share it), plus a
    map-side-combinable (key, hour) count agg — no joins, no skew beyond
    natural per-entity activity."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("k").orderBy(F.col("us").asc())
    base = df.select(F.col(key_col).alias("k"), us.alias("us"))
    staged = (
        base.withColumn("d", F.col("us") - F.lag("us").over(w))
        .withColumn("g", F.expr("d div 1000000"))
        .withColumn("gp", F.lag("g").over(w))
    )
    agg = staged.groupBy("k").agg(
        F.count("g").cast("long").alias("G"),
        F.sum("g").alias("S"),
        F.max("g").alias("gmax"),
        F.sum(F.col("g") * F.col("g")).alias("Q"),
        F.count("gp").cast("long").alias("m"),
        F.sum(F.col("g") * F.col("gp")).alias("P"),
        F.sum("gp").alias("Sa"),
        F.sum(F.when(F.col("gp").isNotNull(), F.col("g"))).alias("Sb"),
        F.sum(F.col("gp") * F.col("gp")).alias("Qa"),
        F.sum(F.when(F.col("gp").isNotNull(), F.col("g") * F.col("g"))).alias("Qb"),
    )
    K = (F.col("G") * F.col("Q") - F.col("S") * F.col("S")).cast("double")
    Sd = F.col("S").cast("double")
    K1 = (F.col("m") * F.col("Qa") - F.col("Sa") * F.col("Sa"))
    K2 = (F.col("m") * F.col("Qb") - F.col("Sb") * F.col("Sb"))
    mnum = (F.col("m") * F.col("P") - F.col("Sa") * F.col("Sb")).cast("double")
    from nyxus_spark.compare import fround4
    burst = F.when(
        (F.col("G") >= 2) & ((F.col("S") > 0) | (F.col("G") * F.col("Q") > F.col("S") * F.col("S"))),
        fround4((F.sqrt(K) - Sd) / (F.sqrt(K) + Sd)),
    )
    mem = F.when(
        (F.col("m") >= 2) & (K1 > 0) & (K2 > 0),
        fround4(mnum / (F.sqrt(K1.cast("double")) * F.sqrt(K2.cast("double")))),
    )
    per_key = agg.select(
        F.col("k"),
        F.col("G").alias("ia_n_gaps"),
        F.col("S").alias("ia_sum_s"),
        F.col("gmax").alias("ia_max_s"),
        burst.alias("ia_burstiness"),
        mem.alias("ia_memory"),
    )
    hr = base.select("k", F.expr("us div 3600000000").alias("h"))
    hc = hr.groupBy("k", "h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    fano = hc.groupBy("k").agg(
        (F.max("h") - F.min("h") + 1).alias("nh"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    ).select(
        "k",
        fround4(
            (F.col("nh") * F.col("q") - F.col("n") * F.col("n")).cast("double")
            / (F.col("nh") * F.col("n")).cast("double")
        ).alias("ia_fano_hourly"),
    )
    return per_key.join(fano, "k").withColumnRenamed("k", key_col)


def trend_stats(df: DataFrame, key_col: str = "doc_id", ts_col: str = "ts"):
    """Robust per-key activity trend over DAILY event counts: Mann–Kendall
    S = Σ_{i<j} sign(c_j − c_i) (the distribution-free monotone-trend
    statistic, exact int64) and the Theil–Sen slope as the LOWER median of
    the pairwise-slope set (k-th smallest, k = (m+1) div 2 — an element
    PICK, never an interpolation, so the gated double is one IEEE division
    both engines perform identically).

    Scale story: the pair self-join is per key over the per-day count dim,
    so pair count per key is bounded by the corpus SPAN in days squared —
    a constant w.r.t. data volume; the join co-partitions on key_col.
    Trend analog of the reference's per-ROI time-axis deltas
    (/root/reference/src/nyx/constants.h:3 t_index slicing).
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    daily = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = daily.select("k", F.col("d").alias("di"), F.col("c").alias("ci"))
    b = daily.select("k", F.col("d").alias("dj"), F.col("c").alias("cj"))
    pr = (
        a.join(b, "k")
        .filter(F.col("dj") > F.col("di"))
        .withColumn(
            "slope",
            (F.col("cj") - F.col("ci")).cast("double")
            / (F.col("dj") - F.col("di")).cast("double"),
        )
    )
    mk = pr.groupBy("k").agg(
        F.sum(
            F.when(F.col("cj") > F.col("ci"), 1)
            .when(F.col("cj") < F.col("ci"), -1)
            .otherwise(0)
        ).cast("long").alias("mk_s"),
        F.count(F.lit(1)).cast("long").alias("mk_pairs"),
    ).withColumn(
        "mk_sign",
        F.when(F.col("mk_s") > 0, 1)
        .when(F.col("mk_s") < 0, -1)
        .otherwise(0)
        .cast("int"),
    )
    wmed = Window.partitionBy("k").orderBy(
        F.col("slope").asc(), F.col("di").asc(), F.col("dj").asc())
    wcnt = Window.partitionBy("k")
    med = (
        pr.withColumn("rn", F.row_number().over(wmed))
        .withColumn("m", F.count(F.lit(1)).over(wcnt))
        .filter(F.col("rn") == F.expr("(m + 1) div 2"))
        .select("k", F.col("slope").alias("ts_slope"))
    )
    keys = daily.select("k").distinct()
    return (
        keys.join(mk, "k", "left")
        .join(med, "k", "left")
        .withColumn("mk_s", F.coalesce("mk_s", F.lit(0).cast("long")))
        .withColumn("mk_pairs", F.coalesce("mk_pairs", F.lit(0).cast("long")))
        .withColumn("mk_sign", F.coalesce("mk_sign", F.lit(0).cast("int")))
        .withColumnRenamed("k", key_col)
    )
