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
    narrow full scan computing gain = size(array_except(set, covered))
    against the covered set (broadcast state bounded by the UNIVERSE size,
    not the corpus) followed by a TakeOrderedAndProject of ONE row — k rows
    total cross the driver, never the corpus. Deterministic end-to-end, so
    a recursive-CTE oracle replays every pick.

    Returns (id_col, sc_step, sc_gain): the k picked ids, pick order
    1..k, and each pick's marginal coverage gain (exact ints).
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16] (k driver probe rounds), got {k}")
    covered: set = set()
    picks = []
    for step in range(1, k + 1):
        if covered:
            lit = "array(" + ",".join(str(int(x)) for x in sorted(covered)) + ")"
            gain = F.expr(f"size(array_except({set_col}, {lit}))")
        else:
            gain = F.size(set_col)
        best = (
            df.withColumn("__g", gain)
            .orderBy(F.col("__g").desc(), F.col(id_col).asc())
            .select(id_col, set_col, "__g")
            .limit(1)
            .collect()[0]
        )
        picks.append((int(best[id_col]), step, int(best["__g"])))
        covered |= set(int(x) for x in best[set_col])
    return df.sparkSession.createDataFrame(
        picks, f"{id_col} long, sc_step long, sc_gain long"
    )
