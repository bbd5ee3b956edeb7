"""Exact binary-classifier evaluation metrics: ROC-AUC, precision/recall/F1.

The model-quality audit of a data pipeline's learned filters (quality
classifiers, dedup verdicts, contamination flags) — engine-exact so the
numbers gate cross-engine:

* ROC-AUC via the Mann–Whitney U statistic with MIDRANK tie handling
  (identical to sklearn's roc_auc_score): 2U is an exact integer built from
  a per-DISTINCT-SCORE aggregation + one dim-grain cumulative window —
  never a corpus-wide row rank — then ONE division by 2·n_pos·n_neg.
* precision/recall/F1 from exact tp/fp/fn counts, each one division
  (F1 = 2tp/(2tp + fp + fn), division-by-zero guarded to NULL).

Scale shape: AUC's heavy step is a value-grain hash aggregation (the
shuffle carries distinct scores, not rows); the cumulative window runs over
the score dimension. P/R/F1 is a single 4-cell aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One-row DataFrame: (auc_n_pos, auc_n_neg, auc_u2, auc4).

    `label_col` must be 0/1 (castable); rows with NULL score or label are
    excluded. With midranks, Σ_{positives} rank = Σ over score groups
    cnt_pos_g·(cum_before_g + (cnt_g + 1)/2); doubling clears the half:
    u2 = Σ cnt_pos_g·(2·cum_before_g + cnt_g + 1) − n_pos·(n_pos + 1),
    AUC = u2 / (2·n_pos·n_neg) — exact integers, ONE IEEE division.
    Degenerate (single-class) inputs yield NULL auc4."""
    from nyxus_spark.compare import fround4

    lab = F.col(label_col).cast("long")
    base = df.filter(F.col(score_col).isNotNull() & lab.isNotNull()).select(
        F.col(score_col).alias("__s"), lab.alias("__y")
    )
    g = base.groupBy("__s").agg(
        F.count("*").cast("long").alias("__c"),
        F.sum("__y").cast("long").alias("__cp"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn("__cb", F.coalesce(F.sum("__c").over(w), F.lit(0)).cast("long"))
    agg = g.agg(
        F.sum("__cp").cast("long").alias("auc_n_pos"),
        (F.sum("__c") - F.sum("__cp")).cast("long").alias("auc_n_neg"),
        F.sum(F.col("__cp") * (2 * F.col("__cb") + F.col("__c") + 1))
        .cast("long").alias("__rp2"),
    )
    u2 = F.col("__rp2") - F.col("auc_n_pos") * (F.col("auc_n_pos") + 1)
    return agg.select(
        "auc_n_pos",
        "auc_n_neg",
        u2.cast("long").alias("auc_u2"),
        F.when(
            (F.col("auc_n_pos") > 0) & (F.col("auc_n_neg") > 0),
            fround4(u2 / (2 * F.col("auc_n_pos") * F.col("auc_n_neg"))),
        ).alias("auc4"),
    )


def calibration_table(
    df: DataFrame, score_col: str, label_col: str, bins: int = 10,
    tiebreak: str = "doc_id",
) -> DataFrame:
    """RELIABILITY table — the calibration audit beside AUC: rows ranked by
    (score, tiebreak) split into `bins` ntiles (a TOTAL order, so the bin
    boundaries are engine-deterministic), each bin reporting its exact row
    count and empirical positive rate (ONE division). Returns the input
    plus ``cal_bin`` (1..bins), ``cal_n``, ``cal_rate4`` per row — join
    fodder for per-row gating; the bin table itself is `bins` rows.

    Scale note: ntile is a global-order window — at corpus scale compute
    bins from the value-grain cumulative table instead (percentile_clip's
    machinery); the ntile form is the eval-sample shape."""
    from nyxus_spark.compare import fround4

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    w = Window.orderBy(F.col(score_col).asc(), F.col(tiebreak).asc())
    out = df.withColumn("cal_bin", F.ntile(bins).over(w).cast("long"))
    bt = out.groupBy("cal_bin").agg(
        F.count("*").cast("long").alias("cal_n"),
        F.sum(F.col(label_col).cast("long")).cast("long").alias("__pos"),
    ).select(
        "cal_bin", "cal_n",
        fround4(F.col("__pos") / F.col("cal_n")).alias("cal_rate4"),
    )
    return out.join(F.broadcast(bt), "cal_bin")


def prf_counts(df: DataFrame, pred_col: str, label_col: str) -> DataFrame:
    """One-row DataFrame: (tp, fp, fn, tn, prec4, rec4, f14) from exact
    confusion counts; empty denominators yield NULL."""
    from nyxus_spark.compare import fround4

    p = F.col(pred_col).cast("long")
    y = F.col(label_col).cast("long")
    agg = df.filter(p.isNotNull() & y.isNotNull()).agg(
        F.sum((p * y)).cast("long").alias("tp"),
        F.sum(p * (1 - y)).cast("long").alias("fp"),
        F.sum((1 - p) * y).cast("long").alias("fn"),
        F.sum((1 - p) * (1 - y)).cast("long").alias("tn"),
    )
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") > 0,
               fround4(F.col("tp") / (F.col("tp") + F.col("fp")))).alias("prec4"),
        F.when(F.col("tp") + F.col("fn") > 0,
               fround4(F.col("tp") / (F.col("tp") + F.col("fn")))).alias("rec4"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            fround4(2 * F.col("tp")
                    / (2 * F.col("tp") + F.col("fp") + F.col("fn"))),
        ).alias("f14"),
    )
