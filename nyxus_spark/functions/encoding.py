"""Tabular feature-encoding operators: LOO target encoding, Bayesian-smoothed
category means, group standardization, percentile rank, winsorization.

The bread-and-butter categorical/numeric encoders every tabular feature
pipeline ships (the per-entity aggregate features nyxus computes per label,
recast onto grouping columns — reference analog: per-ROI aggregation in
featureset.cpp rolled up by nested_feature_aggregation.h semantics).

All encoders are engine-exact by construction:
* integer numerators (sums of exact BIGINT targets, cross-multiplied
  smoothing) with ONE final IEEE division;
* the z-score is a fixed chain a/(n·sqrt(v/(n·(n−1)))) of exact integers
  (sqrt is correctly rounded, each division/multiply one IEEE op);
* percentile bounds use the LOWER-RANK rule (the value at position
  max(1, (n·k) div 100) of the sorted group) — selection on exact integers,
  computed DISTRIBUTED via a value-grain aggregation + cumulative window
  (never a per-group collect; groups may be huge at corpus scale).

Scale shape: every encoder is one partial+final hash aggregation on the
grouping key plus one broadcast-able join back (category tables are
metadata-sized); the percentile path adds one value-grain aggregation whose
cumulative window runs over the (group × distinct value) grid, not the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: int = 20,
    prefix: str = "te",
) -> DataFrame:
    """Leave-one-out + Bayesian-smoothed target encoding of `cat_col`
    against the exact-integer `target_col` (nulls = rows without a target,
    excluded from the statistics).

    Appends:
    * ``{prefix}_n``   — category target count (BIGINT);
    * ``{prefix}_loo4`` — leave-one-out mean (S_c − x)/(n_c − 1) on rows
      with a target and n_c > 1 (NULL otherwise) — the leakage-free variant
      a training pipeline must use for the row's own category feature;
    * ``{prefix}_sm4`` — smoothed mean (S_c + m·ĝ)/(n_c + m) with ĝ the
      global mean, computed as the cross-multiplied exact rational
      (S_c·G_n + m·G_S)/((n_c + m)·G_n) — ONE division; defined for every
      row (empty category → the global mean exactly).
    """
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    from nyxus_spark.compare import fround4

    t = F.col(target_col).cast("long")
    cat = df.groupBy(cat_col).agg(
        F.count(t).cast("long").alias("__te_n"),
        F.coalesce(F.sum(t), F.lit(0)).cast("long").alias("__te_s"),
    )
    glob = df.agg(
        F.count(t).cast("long").alias("__te_gn"),
        F.coalesce(F.sum(t), F.lit(0)).cast("long").alias("__te_gs"),
    )
    out = df.join(F.broadcast(cat), cat_col, "left").crossJoin(F.broadcast(glob))
    n_c, s_c = F.coalesce("__te_n", F.lit(0)), F.coalesce("__te_s", F.lit(0))
    loo = F.when(
        t.isNotNull() & (n_c > 1), fround4((s_c - t) / (n_c - 1))
    )
    sm = fround4(
        (s_c * F.col("__te_gn") + F.lit(m) * F.col("__te_gs"))
        / ((n_c + F.lit(m)) * F.col("__te_gn"))
    )
    return (
        out.withColumn(f"{prefix}_n", n_c.cast("long"))
        .withColumn(f"{prefix}_loo4", loo)
        .withColumn(f"{prefix}_sm4", F.when(F.col("__te_gn") > 0, sm))
        .drop("__te_n", "__te_s", "__te_gn", "__te_gs")
    )


def group_standardize(
    df: DataFrame,
    group_col: str,
    val_col: str,
    prefix: str = "gz",
) -> DataFrame:
    """Within-group z-score of the exact-integer `val_col` — the per-source
    standardization every mixed-corpus feature matrix needs. The fixed IEEE
    chain z = (n·x − S) / (n · sqrt((n·Σx² − S²) / (n·(n−1)))) keeps every
    operand an exact BIGINT until the single division/sqrt steps, so the
    value is engine-bit-identical. NULL when the group is constant or has
    fewer than 2 rows. Appends ``{prefix}_z4``."""
    from nyxus_spark.compare import fround4

    x = F.col(val_col).cast("long")
    g = df.groupBy(group_col).agg(
        F.count(x).cast("long").alias("__gz_n"),
        F.sum(x).cast("long").alias("__gz_s"),
        F.sum(x * x).cast("long").alias("__gz_e"),
    )
    out = df.join(F.broadcast(g), group_col, "left")
    n, s, e = F.col("__gz_n"), F.col("__gz_s"), F.col("__gz_e")
    v = n * e - s * s
    z = (n * x - s) / (
        n * F.sqrt(v / (n * (n - 1)))
    )
    return (
        out.withColumn(
            f"{prefix}_z4",
            F.when((n > 1) & (v > 0), fround4(z)),
        ).drop("__gz_n", "__gz_s", "__gz_e")
    )


def percentile_clip(
    df: DataFrame,
    group_col: str,
    val_col: str,
    lo_pct: int = 10,
    hi_pct: int = 90,
    prefix: str = "pc",
) -> DataFrame:
    """Percentile RANK + WINSORIZATION within each group, exact and
    distributed: the lower/upper bounds are the values at sorted position
    max(1, (n·k) div 100) (the lower-rank rule the prescan decile vector
    uses), derived from a value-grain count aggregation + one cumulative
    window over the (group × distinct value) grid — never a per-group
    collect. Appends:

    * ``{prefix}_rank4`` — (rank − 1)/(n − 1), rank = RANK() (ties share),
      NULL for single-row groups;
    * ``{prefix}_lo`` / ``{prefix}_hi`` — the group's clip bounds (BIGINT);
    * ``{prefix}_wins`` — val clamped into [lo, hi] (BIGINT).
    """
    if not (0 < lo_pct < hi_pct < 100):
        raise ValueError(f"need 0 < lo_pct < hi_pct < 100, got {lo_pct}, {hi_pct}")
    x = F.col(val_col).cast("long")
    vc = df.groupBy(group_col, x.alias("__v")).agg(
        F.count("*").cast("long").alias("__c")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(group_col)
    vc = (
        vc.withColumn("__cum", F.sum("__c").over(wcum).cast("long"))
        .withColumn("__n", F.sum("__c").over(wn).cast("long"))
    )

    # lower-rank rule: bound = smallest value whose cumulative count reaches
    # max(1, (n·pct) div 100) — pure integer arithmetic
    k_lo = F.expr(f"greatest(cast(1 as bigint), (__n * {lo_pct}) div 100)")
    k_hi = F.expr(f"greatest(cast(1 as bigint), (__n * {hi_pct}) div 100)")
    bounds = vc.groupBy(group_col).agg(
        F.min(F.when(F.col("__cum") >= k_lo, F.col("__v"))).cast("long").alias(f"{prefix}_lo"),
        F.min(F.when(F.col("__cum") >= k_hi, F.col("__v"))).cast("long").alias(f"{prefix}_hi"),
        F.max("__n").cast("long").alias("__pc_n"),
    )
    from nyxus_spark.compare import fround4

    wr = Window.partitionBy(group_col).orderBy(x.asc())
    out = (
        df.withColumn("__rk", F.rank().over(wr).cast("long"))
        .join(F.broadcast(bounds), group_col, "left")
    )
    return (
        out.withColumn(
            f"{prefix}_rank4",
            F.when(F.col("__pc_n") > 1,
                   fround4((F.col("__rk") - 1) / (F.col("__pc_n") - 1))),
        )
        .withColumn(
            f"{prefix}_wins",
            F.greatest(F.col(f"{prefix}_lo"),
                       F.least(F.col(f"{prefix}_hi"), x)).cast("long"),
        )
        .drop("__rk", "__pc_n")
    )
