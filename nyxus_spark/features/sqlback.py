"""Catalyst-native (zero-Python) backend for the exactly-expressible
first-order features.

The default engine runs the numpy kernels over Arrow batches (mapInArrow,
features/compute.py) — the right call for the full catalog. But for narrow
feature sets the statistical family is expressible as PURE column
expressions, and then the whole job is one WholeStageCodegen projection:
no Python workers, no Arrow crossing, pushdown/pruning/AQE all free. This
module provides that alternative path with BIT-IDENTICAL results.

Why bit-identical is achievable (same argument as the DuckDB oracles,
oracles.py / CLAUDE.md): the kernel accumulates per-row sums with
np.bincount — a sequential fold over the row's values in array order —
and Spark's `aggregate(tokens, 0D, (a, x) -> a + f(x))` is the SAME
sequence of IEEE additions from the same seed. Integer-valued sums
(Σx, Σx², histogram counts) are exact regardless of order; the
float-valued deviation folds (Σd², Σ|d|, Σd³…) replay addition-for-
addition; the power chains are the kernel's explicit IEEE chains
(d³ = (d·d)·d, x^1.5 = x·sqrt(x), …; firstorder.py:149-171), every op
correctly rounded, so the JVM reproduces numpy double-for-double.

Blank/empty semantics replicate intensity.cpp:60-96 via firstorder.py's
`fin`: empty rows → NaN (COUNT → 0); blank rows (min == max) → NaN except
MIN/MAX → the value, RANGE → 0, MEAN/MEDIAN → min.

Not expressible here (stay on the kernel path): the interpolated
percentile walk (P01…QCOD, ROBUST_*), ENTROPY (libm log2 differs across
engines), MEDIAN_ABSOLUTE_DEVIATION's dependence on the in-row median is
expressible and included. Parity is enforced by
tests/test_sqlback.py against the kernel on real data + edge rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 64

# ---- shared sub-expression builders (SQL text, inlined where needed) ------


def _x(tok: str) -> dict[str, str]:
    pop = f"cast(size({tok}) as double)"
    vmin = f"cast(array_min({tok}) as double)"
    vmax = f"cast(array_max({tok}) as double)"
    rng = f"({vmax} - {vmin})"
    s1 = f"aggregate({tok}, 0D, (a, x) -> a + cast(x as double))"
    mean = f"({s1} / {pop})"
    d = f"(cast(x as double) - {mean})"
    dd = f"({d} * {d})"
    energy = f"aggregate({tok}, 0D, (a, x) -> a + cast(x as double) * cast(x as double))"
    ss = f"aggregate({tok}, 0D, (a, x) -> a + {dd})"
    mad = f"(aggregate({tok}, 0D, (a, x) -> a + abs({d})) / {pop})"
    m3 = f"aggregate({tok}, 0D, (a, x) -> a + {dd} * {d})"
    m4 = f"aggregate({tok}, 0D, (a, x) -> a + {dd} * {dd})"
    s5 = f"aggregate({tok}, 0D, (a, x) -> a + ({dd} * {dd}) * {d})"
    s6 = f"aggregate({tok}, 0D, (a, x) -> a + ({dd} * {d}) * ({dd} * {d}))"
    var = f"(CASE WHEN {pop} > 1D THEN {ss} / ({pop} - 1D) ELSE 0D END)"
    var_b = f"(CASE WHEN {pop} > 1D THEN {ss} / {pop} ELSE 0D END)"
    std = f"sqrt({var})"
    std_b = f"sqrt({var_b})"
    srt = f"array_sort({tok})"
    n = f"size({tok})"
    # element_at needs an INT index: `div` yields BIGINT (see CLAUDE.md)
    mid = f"cast({n} div 2 as int)"
    median = (
        f"(CASE WHEN {n} % 2 = 1 THEN cast(element_at({srt}, {mid} + 1) as double)"
        f" ELSE (cast(element_at({srt}, {mid}) as double)"
        f"       + cast(element_at({srt}, {mid} + 1) as double)) / 2.0D END)"
    )
    medad = f"(aggregate({tok}, 0D, (a, x) -> a + abs(cast(x as double) - {median})) / {pop})"
    # mode: smallest value of the highest frequency — max over (count, -v)
    mode = (
        f"cast(-(array_max(transform(array_distinct({tok}),"
        f" u -> struct(size(filter({tok}, x -> x = u)) as c, -u as nv))).nv)"
        f" as double)"
    )
    # custom N-bin histogram uniformity: bin = int((v-min)/range*N), clipped
    # to [0, N] with the overflow bin folded into N-1 ⇒ effective bin =
    # least(int(...), N-1); counts are exact ints, ONE final division
    binid = f"least(cast((cast(x as double) - {vmin}) / {rng} * {N_BINS}D as int), {N_BINS - 1})"
    cnt_b = f"size(filter({tok}, x -> {binid} = b))"
    uni = (
        f"(aggregate(sequence(0, {N_BINS - 1}), 0D,"
        f" (a, b) -> a + cast({cnt_b} as double) * cast({cnt_b} as double))"
        f" / ({pop} * {pop}))"
    )
    return dict(pop=pop, vmin=vmin, vmax=vmax, rng=rng, s1=s1, mean=mean,
                energy=energy, ss=ss, mad=mad, m3=m3, m4=m4, s5=s5, s6=s6,
                var=var, var_b=var_b, std=std, std_b=std_b, median=median,
                medad=medad, mode=mode, uni=uni)


SQL_FIRSTORDER_FEATURES = [
    "COUNT", "MIN", "MAX", "RANGE", "MEAN", "MEDIAN", "MODE",
    "ENERGY", "ROOT_MEAN_SQUARED", "INTEGRATED_INTENSITY",
    "MEAN_ABSOLUTE_DEVIATION", "MEDIAN_ABSOLUTE_DEVIATION",
    "VARIANCE", "VARIANCE_BIASED",
    "STANDARD_DEVIATION", "STANDARD_DEVIATION_BIASED", "STANDARD_ERROR",
    "COV", "SKEWNESS", "KURTOSIS", "EXCESS_KURTOSIS",
    "HYPERSKEWNESS", "HYPERFLATNESS",
    "UNIFORMITY", "UNIFORMITY_PIU",
]


def sql_firstorder_exprs(tokens_col: str = "tokens"):
    """Column expressions replicating firstorder_section bit-for-bit for
    SQL_FIRSTORDER_FEATURES (op-order notes in the module docstring)."""
    e = _x(tokens_col)
    pop, ss, std = e["pop"], e["ss"], e["std"]
    raw = {
        "COUNT": pop,
        "MIN": e["vmin"],
        "MAX": e["vmax"],
        "RANGE": e["rng"],
        "MEAN": e["mean"],
        "MEDIAN": e["median"],
        "MODE": e["mode"],
        "ENERGY": e["energy"],
        "ROOT_MEAN_SQUARED": f"sqrt({e['energy']} / {pop})",
        "INTEGRATED_INTENSITY": e["s1"],
        "MEAN_ABSOLUTE_DEVIATION": e["mad"],
        "MEDIAN_ABSOLUTE_DEVIATION": e["medad"],
        "VARIANCE": e["var"],
        "VARIANCE_BIASED": e["var_b"],
        "STANDARD_DEVIATION": std,
        "STANDARD_DEVIATION_BIASED": e["std_b"],
        "STANDARD_ERROR": f"({std} / sqrt({pop}))",
        "COV": f"({std} / {e['mean']})",
        # explicit IEEE chains — same tree as the kernel (firstorder.py)
        "SKEWNESS": (
            f"(CASE WHEN {pop} > 3D AND {ss} > 0D"
            f" THEN sqrt({pop}) * {e['m3']} / ({ss} * sqrt({ss}))"
            f" ELSE 0D END)"
        ),
        "KURTOSIS": (
            f"(CASE WHEN {pop} > 4D AND {ss} > 0D"
            f" THEN {pop} * {e['m4']} / ({ss} * {ss}) ELSE 0D END)"
        ),
        "EXCESS_KURTOSIS": (
            f"(CASE WHEN {pop} > 4D AND {ss} > 0D"
            f" THEN {pop} * {e['m4']} / ({ss} * {ss}) - 3.0D ELSE 0D END)"
        ),
        "HYPERSKEWNESS": (
            f"(CASE WHEN {pop} * ((({std} * {std}) * ({std} * {std})) * {std}) != 0D"
            f" THEN {e['s5']} / ({pop} * ((({std} * {std}) * ({std} * {std})) * {std}))"
            f" ELSE 0D END)"
        ),
        "HYPERFLATNESS": (
            f"(CASE WHEN {pop} * ((({std} * {std}) * ({std} * {std})) * ({std} * {std})) != 0D"
            f" THEN {e['s6']} / ({pop} * ((({std} * {std}) * ({std} * {std})) * ({std} * {std})))"
            f" ELSE 0D END)"
        ),
        "UNIFORMITY": e["uni"],
        "UNIFORMITY_PIU": f"((1.0D - {e['rng']} / ({e['vmax']} + {e['vmin']})) * 100.0D)",
    }
    # blank/empty dispatch (intensity.cpp:60-96 via firstorder.fin)
    empty = f"size({tokens_col}) = 0"
    blank = f"size({tokens_col}) > 0 AND {e['rng']} = 0D"
    nan = "cast('NaN' as double)"
    blank_val = {
        "MIN": e["vmin"], "MAX": e["vmax"], "RANGE": "0D",
        "MEAN": e["vmin"], "MEDIAN": e["vmin"],
    }
    out = {}
    for name, expr in raw.items():
        if name == "COUNT":
            out[name] = F.expr(f"CASE WHEN {empty} THEN 0D ELSE {pop} END")
            continue
        bv = blank_val.get(name, nan)
        out[name] = F.expr(
            f"CASE WHEN {empty} THEN {nan}"
            f" WHEN {blank} THEN {bv}"
            f" ELSE {expr} END"
        )
    return out


def extract_features_sql(
    df: DataFrame,
    features: list[str] | None = None,
    tokens_col: str = "tokens",
    keep_tokens: bool = False,
) -> DataFrame:
    """Feature extraction through pure Catalyst expressions — the
    zero-Python alternative to features.extract_features for the
    SQL-expressible statistical family. Identical values (parity-pinned);
    the plan is a single whole-stage-codegen projection over the scan."""
    feats = features or SQL_FIRSTORDER_FEATURES
    bad = [f for f in feats if f not in SQL_FIRSTORDER_FEATURES]
    if bad:
        raise ValueError(
            f"not SQL-expressible (use the kernel backend): {bad}"
        )
    exprs = sql_firstorder_exprs(tokens_col)
    keep = [c for c in df.columns if keep_tokens or c != tokens_col]
    return df.select(*keep, *[exprs[f].alias(f) for f in feats])
