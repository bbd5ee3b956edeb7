"""Data-selection operators: skyline / Pareto-front membership.

Corpus curation routinely keeps the *frontier* of a quality/quantity
trade-off (longest docs at every richness level, highest-quality docs at
every length) rather than a single top-k — the classic skyline operator
(Borzsonyi, Kossmann, Stocker: "The Skyline Operator", ICDE 2001). The
reference engine exposes per-ROI feature vectors that downstream users
filter exactly this way (nyxus.py featurize_* -> pandas post-filtering);
here the frontier membership itself is a first-class, exactly-checkable
column.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_flags", "pareto_layers"]


def skyline_flags(df: DataFrame, x_col: str, y_col: str,
                  flag_col: str = "on_skyline") -> DataFrame:
    """Flag each row's membership in the 2-D skyline (maximize both axes).

    Row p is DOMINATED iff some q has q.x >= p.x and q.y >= p.y with at
    least one strict inequality; the skyline is the undominated set.
    Duplicate points do not dominate each other (no strict edge), so every
    copy of a frontier point is flagged 1.

    Scale-safe plan: the textbook skyline is a self-join (quadratic) or a
    global-window sort (single-partition shuffle at 100 TB). Instead split
    dominance by the x-relation:

      x' > p.x: dominated iff max{y' : x' > p.x} >= p.y   (x already strict)
      x' = p.x: dominated iff max{y' : x' = p.x} >  p.y

    The per-x max table has |distinct x| rows (x is a discrete feature such
    as n_tok, so the dim is bounded regardless of corpus size); its
    descending cumulative max over that tiny dim gives max{y' : x' > x},
    and a broadcast join carries both bounds back to the rows. Total cost:
    one hash-agg shuffle + one broadcast join, zero row-table sorts, exact
    integer comparisons end to end.
    """
    dim = df.groupBy(x_col).agg(F.max(y_col).alias("__my"))
    w = Window.orderBy(F.col(x_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cm = dim.withColumn("__maxy_gt", F.max("__my").over(w))
    out = df.join(F.broadcast(cm), x_col)
    flag = (
        (F.col("__maxy_gt").isNull() | (F.col("__maxy_gt") < F.col(y_col)))
        & (F.col("__my") <= F.col(y_col))
    )
    return (
        out.withColumn(flag_col, flag.cast("long"))
        .drop("__my", "__maxy_gt")
        .select(*df.columns, flag_col)
    )


def pareto_layers(df: DataFrame, x_col: str, y_col: str, k: int = 3,
                  layer_col: str = "pareto_layer") -> DataFrame:
    """Onion-peel the first `k` Pareto layers (skyline rank; Chazelle's
    "layers of maxima"): layer 1 is the skyline, layer 2 the skyline of the
    remainder, and so on; rows deeper than layer k get 0. The data-selection
    dial behind "keep the top-L quality/length frontiers" curation — a
    graded version of the binary skyline cut.

    Each round reuses skyline_flags' per-x-max + broadcast plan on the
    remaining rows, so the full cost is k tiny dim aggregations and k
    broadcast joins — no global sorts, no self-joins, and the lineage depth
    is k (small and fixed), no checkpointing needed. Exact integers end to
    end. k is bounded to keep the plan linear; peel iteratively with
    checkpoints if you genuinely need deep ranks.
    """
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8] (plan depth is linear in k), got {k}")
    out = df.withColumn(layer_col, F.lit(0).cast("long"))
    for level in range(1, k + 1):
        remaining = out.filter(F.col(layer_col) == 0)
        flagged = skyline_flags(remaining.drop(layer_col), x_col, y_col,
                                flag_col="__sf")
        out = out.filter(F.col(layer_col) != 0).unionByName(
            flagged.withColumn(
                layer_col,
                F.when(F.col("__sf") == 1, F.lit(level)).otherwise(F.lit(0))
                .cast("long"),
            ).drop("__sf")
        )
    return out


def greedy_set_cover(
    df: DataFrame,
    k: int = 8,
    id_col: str = "oid",
    set_col: str = "ts",
) -> DataFrame:
    """Greedy maximum-coverage selection (the (1−1/e)-approximate set-cover
    walk): pick k rows whose element sets add the most NEW coverage, ties to
    the lowest id — the eval-set / benchmark-coverage curation primitive
    ("choose k docs that exercise the most distinct shingles").

    Scale shape mirrors `greedy_kcenter`: each of the k rounds is one
    narrow scan of the UNPICKED rows — gain = count of distinct elements
    not yet covered, computed by exploding the set column into a broadcast
    LEFT-ANTI join against the covered-element DataFrame (covered state is
    DATA bounded by the UNIVERSE size, never an expression literal, so the
    plan stays constant-size as coverage grows) — followed by a
    TakeOrderedAndProject of ONE row; k rows total cross the driver, never
    the corpus. Already-picked ids are excluded each round, so the result
    is k DISTINCT docs (fewer iff the corpus has < k rows). Deterministic
    end-to-end, so a recursive-CTE oracle replays every pick.

    `set_col` is treated as a SET: duplicate elements inside one array
    count once (callers pass array_distinct'd shingle sets).

    Returns (id_col, sc_step, sc_gain): the picked ids, pick order
    1..k, and each pick's marginal coverage gain (exact ints).
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16] (k driver probe rounds), got {k}")
    spark = df.sparkSession
    covered: set = set()
    picks = []
    base = df.select(id_col, set_col)
    for step in range(1, k + 1):
        cand = base
        if picks:
            cand = base.filter(~F.col(id_col).isin([p[0] for p in picks]))
        ex = cand.select(id_col, F.explode(set_col).alias("__e")).distinct()
        if covered:
            cov_df = spark.createDataFrame(
                [(int(x),) for x in sorted(covered)], "__ce long"
            )
            ex = ex.join(
                F.broadcast(cov_df),
                ex["__e"].cast("long") == F.col("__ce"),
                "left_anti",
            )
        gains = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("__g"))
        best_rows = (
            cand.join(gains, id_col, "left")
            .withColumn("__g", F.coalesce("__g", F.lit(0)))
            .orderBy(F.col("__g").desc(), F.col(id_col).asc())
            .select(id_col, set_col, "__g")
            .limit(1)
            .collect()
        )
        if not best_rows:
            break  # corpus exhausted before k picks
        best = best_rows[0]
        picks.append((int(best[id_col]), step, int(best["__g"])))
        covered |= set(int(x) for x in best[set_col])
    return spark.createDataFrame(
        picks, f"{id_col} long, sc_step long, sc_gain long"
    )
