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


def skew_report(df: DataFrame, id_expr, n_buckets: int = 16,
                hot_factor: int = 2) -> DataFrame:
    """Pre-shuffle SKEW diagnostic — the ops pass a 100 TB pipeline runs
    BEFORE a big join/aggregation to find hot keys and unbalanced
    reducers (the inputs to a salting / AQE-skew-join decision, see
    tests/test_asof_skew_aqe.py for what happens without one).

    `id_expr` is an integer column expression for the join key. Emits one
    row per distinct key: `sk_rows` (exact row count), `sk_bucket` (the
    key's shuffle bucket under the engine-reproducible
    (key·MIX mod P31) mod n_buckets mix — re-derivable on any engine,
    unlike Spark's internal hash), `sk_bucket_rows` (that reducer's total
    rows), and two hot flags by exact integer CROSS-MULTIPLICATION (no
    division, no float): `sk_key_hot` = rows·n_keys > hot_factor·total,
    `sk_bucket_hot` = bucket_rows·n_buckets > hot_factor·total.

    Plan shape: ONE (key) hash aggregation (map-side combine — the
    shuffle carries distinct keys, not rows), a bucket-level re-agg of
    the tiny key table, and a broadcast of the 1-row totals. Strictly
    cheaper than the join it diagnoses."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if hot_factor <= 0:
        raise ValueError(f"hot_factor must be positive, got {hot_factor}")
    keyed = (
        df.groupBy(id_expr.cast("bigint").alias("sk_key"))
        .agg(F.count("*").cast("long").alias("sk_rows"))
        .withColumn(
            "sk_bucket",
            F.pmod(
                F.pmod(
                    (F.col("sk_key") % 2147483647) * F.lit(2654435761 % 2147483647),
                    F.lit(2147483647),
                ),
                F.lit(n_buckets),
            ).cast("int"),
        )
    )
    buckets = keyed.groupBy("sk_bucket").agg(
        F.sum("sk_rows").cast("long").alias("sk_bucket_rows")
    )
    totals = keyed.agg(
        F.sum("sk_rows").cast("long").alias("_sk_total"),
        F.count("*").cast("long").alias("_sk_nkeys"),
    )
    return (
        keyed.join(buckets, "sk_bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            "sk_key", "sk_rows", "sk_bucket", "sk_bucket_rows",
            (F.col("sk_rows") * F.col("_sk_nkeys")
             > F.lit(hot_factor) * F.col("_sk_total"))
            .cast("long").alias("sk_key_hot"),
            (F.col("sk_bucket_rows") * F.lit(n_buckets)
             > F.lit(hot_factor) * F.col("_sk_total"))
            .cast("long").alias("sk_bucket_hot"),
        )
    )


def exact_range_bounds(df: DataFrame, value_col: str, n_parts: int) -> DataFrame:
    """Deterministic range-partition boundary planner — the exact,
    re-derivable replacement for Spark's RangePartitioner bounds (which
    come from a nondeterministic reservoir sample, so two runs of
    repartitionByRange can split differently). bound_k (k = 1..n_parts-1)
    is the SMALLEST value whose cumulative row count reaches
    ceil(k·N/n_parts) — pure integer arithmetic, identical on any engine,
    so a training-order layout planned from these bounds is reproducible
    forever (the property `sinks.write_training_order` wants).

    Plan shape: one (value) hash aggregation (map-side combine — the
    shuffle carries distinct values, not rows), then a cumulative window
    over the per-VALUE count table. That window is global but runs at the
    dim grain (|distinct values| rows); for genuinely unbounded key
    domains, replace it with the two-pass distributed prefix sum
    (per-partition subtotals + broadcast offsets) — the boundary
    definition is unchanged.

    Returns (bound_idx ∈ 1..n_parts-1, bound_val). Partition of a value v
    = |{k : bound_k < v}| — ranges (bound_k, bound_{k+1}]."""
    from pyspark.sql import Window

    if n_parts < 2:
        raise ValueError(f"n_parts must be >= 2, got {n_parts}")
    counts = df.groupBy(F.col(value_col).alias("bound_val")).agg(
        F.count("*").cast("long").alias("_c")
    )
    w = Window.orderBy("bound_val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cc = counts.withColumn("_ccum", F.sum("_c").over(w))
    tot = counts.agg(F.sum("_c").cast("long").alias("_n"))
    karr = F.array(*[F.lit(k) for k in range(1, n_parts)])
    return (
        cc.crossJoin(F.broadcast(tot))
        .withColumn("_k", F.explode(karr))
        .withColumn("_tgt", F.expr(f"(_k * _n + {n_parts - 1}) div {n_parts}"))
        .filter(
            (F.col("_ccum") - F.col("_c") < F.col("_tgt"))
            & (F.col("_tgt") <= F.col("_ccum"))
        )
        .select(F.col("_k").cast("int").alias("bound_idx"), "bound_val")
    )


def manifest_prune(
    df: DataFrame,
    id_expr_sql: str,
    value_col: str,
    file_rows: int = 32,
    lo_pct: int = 25,
    hi_pct: int = 75,
) -> DataFrame:
    """SCAN-PLANNING simulation — the Iceberg/Delta manifest min/max file
    pruning decision as a checked artifact (the mechanism that lets a
    100 TB range query read a sliver of its files; reference analog: the
    prescan pass that skips whole slides outside the requested range,
    workflow_2d_segmented.cpp:175-205):

    * pseudo-FILES = id div file_rows — exactly the layout the sorted
      `sinks.write_sized` writer produces, re-derivable on any engine;
    * the MANIFEST = per-file (row count, min, max) of `value_col` — one
      hash aggregation, the stats an Iceberg manifest carries per data
      file;
    * the query predicate is `value_col BETWEEN lo AND hi` with bounds at
      the corpus lower-rank percentiles `lo_pct`/`hi_pct` (data-derived, so
      the oracle re-derives the whole plan from scratch);
    * a file is SCANNED iff [f_min, f_max] intersects [lo, hi] — pruning is
      SOUND by construction (every matching row lives in a scanned file —
      pytest-pinned) and the gate makes every manifest stat, bound, and
      per-file decision value-exact.

    Appends per row: ``mf_file``, ``mf_rows``, ``mf_min``, ``mf_max``,
    ``mf_scan`` (its file survives), ``mf_hit`` (the row itself matches),
    plus broadcast corpus totals ``mf_files``, ``mf_files_scanned``,
    ``mf_rows_skipped``."""
    if file_rows <= 0:
        raise ValueError(f"file_rows must be positive, got {file_rows}")
    if not (0 < lo_pct < hi_pct < 100):
        raise ValueError(f"need 0 < lo_pct < hi_pct < 100, got {lo_pct}, {hi_pct}")
    from pyspark.sql import Window

    x = F.col(value_col).cast("long")
    t = df.withColumn("mf_file", F.expr(f"({id_expr_sql}) div {file_rows}").cast("long"))
    man = t.groupBy("mf_file").agg(
        F.count("*").cast("long").alias("mf_rows"),
        F.min(x).cast("long").alias("mf_min"),
        F.max(x).cast("long").alias("mf_max"),
    )
    # corpus percentile bounds by the lower-rank rule (value-grain agg +
    # one dim-sized cumulative window)
    vc = df.groupBy(x.alias("__v")).agg(F.count("*").cast("long").alias("__c"))
    wcum = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    vc = vc.withColumn("__cum", F.sum("__c").over(wcum).cast("long")).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy()).cast("long")
    )
    k_lo = F.expr(f"greatest(cast(1 as bigint), (__n * {lo_pct}) div 100)")
    k_hi = F.expr(f"greatest(cast(1 as bigint), (__n * {hi_pct}) div 100)")
    bounds = vc.agg(
        F.min(F.when(F.col("__cum") >= k_lo, F.col("__v"))).cast("long").alias("mf_lo"),
        F.min(F.when(F.col("__cum") >= k_hi, F.col("__v"))).cast("long").alias("mf_hi"),
    )
    man = man.crossJoin(F.broadcast(bounds)).withColumn(
        "mf_scan",
        ((F.col("mf_max") >= F.col("mf_lo")) & (F.col("mf_min") <= F.col("mf_hi")))
        .cast("long"),
    )
    totals = man.agg(
        F.count("*").cast("long").alias("mf_files"),
        F.sum("mf_scan").cast("long").alias("mf_files_scanned"),
        F.sum(F.when(F.col("mf_scan") == 0, F.col("mf_rows")).otherwise(F.lit(0)))
        .cast("long").alias("mf_rows_skipped"),
    )
    return (
        t.join(F.broadcast(man), "mf_file")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "mf_hit",
            ((x >= F.col("mf_lo")) & (x <= F.col("mf_hi"))).cast("long"),
        )
    )


def snapshot_diff(old_df: DataFrame, new_df: DataFrame,
                  id_col: str = "doc_id", key_col: str = "key",
                  carry_cols: tuple = ()) -> DataFrame:
    """Dataset-VERSION audit between two corpus snapshots — the lineage
    pass a managed 100 TB corpus runs on every refresh: one full-outer
    join on the document id comparing content keys yields a per-id status
    in {added, removed, modified, unchanged}. `key_col` is any injective
    content serialization (or a collision-checked content hash at scale).

    `carry_cols` are passed through via COALESCE(old, new) — e.g. the
    source, for per-source churn rollups.

    Scale shape: ONE join; with both snapshots bucketed on the id
    (Iceberg bucket(id), see sinks.write_bucketed) it is exchange-free —
    the audit costs a co-partitioned scan, not a shuffle."""
    o = old_df.select(
        F.col(id_col), F.col(key_col).alias("_old_key"),
        *[F.col(c).alias(f"_o_{c}") for c in carry_cols],
    )
    n = new_df.select(
        F.col(id_col), F.col(key_col).alias("_new_key"),
        *[F.col(c).alias(f"_n_{c}") for c in carry_cols],
    )
    status = (
        F.when(F.col("_old_key").isNull(), F.lit("added"))
        .when(F.col("_new_key").isNull(), F.lit("removed"))
        .when(F.col("_old_key") == F.col("_new_key"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return o.join(n, id_col, "full_outer").select(
        F.col(id_col),
        status.alias("diff_status"),
        *[F.coalesce(f"_o_{c}", f"_n_{c}").alias(c) for c in carry_cols],
    )


def ks_drift(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift of each group's value
    distribution against its COMPLEMENT (rest of the corpus) — the
    distribution-shift monitor that catches what a mean/χ² drift check
    misses (shape changes at equal totals). Engine-exact: at every
    observed value x,

        |F_s(x) − F_rest(x)| = |cum_s(x)·(N−n_s) − (cum_all(x)−cum_s(x))·n_s|
                               ───────────────────────────────────────────
                                            n_s·(N−n_s)

    and the KS statistic's NUMERATOR max is an exact BIGINT (the max of
    integers); only the one final division is IEEE. Groups covering the
    whole corpus (empty complement) return D = 0 by convention.

    Returns one row per group: (group, ks_num, ks_den, ks_d4).

    Scale shape: one (group, value) + one (value) aggregation, then a
    cumulative window PARTITIONED BY GROUP over the |groups|·|distinct x|
    grid — no global sort, no per-row state. At 100 TB bucket the value
    first (the KS of the bucketed distribution bounds the raw one within
    one bucket mass)."""
    from pyspark.sql import Window

    gv = df.groupBy(group_col, value_col).agg(
        F.count("*").cast("long").alias("__c")
    )
    xv = df.groupBy(value_col).agg(F.count("*").cast("long").alias("__ct"))
    grid = gv.select(group_col).distinct().crossJoin(xv)
    j = grid.join(gv, [group_col, value_col], "left").withColumn(
        "__c", F.coalesce("__c", F.lit(0).cast("long"))
    )
    wg = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    j = (
        j.withColumn("__cum_s", F.sum("__c").over(wg).cast("long"))
        .withColumn("__cum_all", F.sum("__ct").over(wg).cast("long"))
    )
    tot = df.groupBy(group_col).agg(F.count("*").cast("long").alias("__n_s"))
    n_all = df.agg(F.count("*").cast("long").alias("__n_all"))
    j = j.join(tot, group_col).crossJoin(F.broadcast(n_all))
    num = F.abs(
        F.col("__cum_s") * (F.col("__n_all") - F.col("__n_s"))
        - (F.col("__cum_all") - F.col("__cum_s")) * F.col("__n_s")
    )
    per = j.groupBy(group_col).agg(
        F.max(num).cast("long").alias("ks_num"),
        F.max(F.col("__n_s") * (F.col("__n_all") - F.col("__n_s")))
         .cast("long").alias("ks_den"),
    )
    from nyxus_spark.compare import fround4

    return per.select(
        group_col, "ks_num", "ks_den",
        F.when(
            F.col("ks_den") > 0,
            fround4(F.col("ks_num").cast("double") / F.col("ks_den").cast("double")),
        ).otherwise(F.lit(0.0)).alias("ks_d4"),
    )
