"""Catalyst-native (zero-Python) backend for the exactly-expressible
first-order features.

The default engine runs the numpy kernels over Arrow batches (mapInArrow,
features/compute.py) — the right call for the full catalog. But for narrow
feature sets the statistical family is expressible as PURE column
expressions, and then the whole job is whole-stage-codegen projections:
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

STAGING MATTERS: per-row scalars (mean, min, range, median) are computed
as COLUMNS in earlier projections and only REFERENCED inside the later
deviation-fold lambdas. Inlining the mean fold into the per-element
lambda would re-evaluate it per element — O(n²) per row, measured ~400×
slower at sf0.1 — and Catalyst's CollapseProject keeps multiply-referenced
non-cheap expressions staged rather than re-inlining them. The histogram
uniformity likewise runs as ONE run-length fold over sorted bin ids
(O(n log n)), not a per-bin rescan (O(64·n), another ~3× of wall).

Measured trade (sf0.1, 5000 rows, local[8], best-of-3 on cached input):
kernel 0.38 s vs SQL 2.03 s over the full 35-code set — the
Arrow-vectorized kernel stays ~5× faster per row. Choose this path for its OPERATIONAL properties, not raw
speed: no Python workers to provision, pure-JVM plans that compose into
SQL views / Structured Streaming stages without an Arrow boundary, and
engine-portable semantics — with bit-identical values when you switch.

Blank/empty semantics replicate intensity.cpp:60-96 via firstorder.py's
`fin`: empty rows → NaN (COUNT → 0); blank rows (min == max) → NaN except
MIN/MAX → the value, RANGE → 0, MEAN/MEDIAN → min.

Covered: the full 36-code firstorder family EXCEPT ENTROPY (libm log2
differs across engines) — including the interpolated 100-bin percentile
walk (histogram.h:298-327), which runs as a sparse present-bin run/cumsum
table built by one fold over sorted bin ids plus per-percentile array
lookups, the same sparse formulation the DuckDB oracle uses
(oracles.sql_percentiles). Parity is enforced by tests/test_sqlback.py
against the kernel on real data + edge rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 64

SQL_FIRSTORDER_FEATURES = [
    "COUNT", "MIN", "MAX", "RANGE", "MEAN", "MEDIAN", "MODE",
    "ENERGY", "ROOT_MEAN_SQUARED", "INTEGRATED_INTENSITY",
    "MEAN_ABSOLUTE_DEVIATION", "MEDIAN_ABSOLUTE_DEVIATION",
    "VARIANCE", "VARIANCE_BIASED",
    "STANDARD_DEVIATION", "STANDARD_DEVIATION_BIASED", "STANDARD_ERROR",
    "COV", "SKEWNESS", "KURTOSIS", "EXCESS_KURTOSIS",
    "HYPERSKEWNESS", "HYPERFLATNESS",
    "UNIFORMITY", "UNIFORMITY_PIU",
    "P01", "P10", "P25", "P75", "P90", "P99",
    "INTERQUARTILE_RANGE", "QCOD",
    "ROBUST_MEAN", "ROBUST_MEAN_ABSOLUTE_DEVIATION",
]


def _staged(df: DataFrame, tok: str) -> DataFrame:
    """Chained projections computing every per-row scalar exactly once."""
    n = f"size({tok})"
    # element_at needs an INT index: `div` yields BIGINT (see CLAUDE.md)
    mid = f"cast({n} div 2 as int)"
    stage1 = df.selectExpr(
        "*",
        f"cast({n} as double) AS __pop",
        f"cast(array_min({tok}) as double) AS __vmin",
        f"cast(array_max({tok}) as double) AS __vmax",
        f"aggregate({tok}, 0D, (a, x) -> a + cast(x as double)) AS __s1",
        f"aggregate({tok}, 0D, (a, x) -> a + cast(x as double)"
        f" * cast(x as double)) AS __energy",
        f"array_sort({tok}) AS __srt",
    )
    # staged divisions/index lookups are EAGER (unlike the lazily-evaluated
    # CASE dispatch below), so each needs its own empty-row guard under
    # ANSI mode; the guarded 0 values are never read (dispatch overrides)
    stage2 = stage1.selectExpr(
        "*",
        "(__vmax - __vmin) AS __rng",
        "(CASE WHEN __pop > 0D THEN __s1 / __pop ELSE 0D END) AS __mean",
        f"(CASE WHEN {n} = 0 THEN 0D"
        f" WHEN {n} % 2 = 1 THEN cast(element_at(__srt, {mid} + 1) as double)"
        f" ELSE (cast(element_at(__srt, {mid}) as double)"
        f"       + cast(element_at(__srt, {mid} + 1) as double)) / 2.0D END)"
        " AS __median",
        # mode: smallest value of the highest frequency — ONE O(n) fold
        # over the sorted array tracking (current run, best run); a later
        # equal-count run never replaces, so ties go to the smallest value
        "cast((aggregate(__srt,"
        " named_struct('bc', 0, 'bv', 0, 'cc', 0, 'pv', cast(null as int)),"
        " (s, x) -> named_struct("
        "   'bc', CASE WHEN (CASE WHEN s.pv IS NOT NULL AND x = s.pv"
        "                    THEN s.cc + 1 ELSE 1 END) > s.bc"
        "              THEN (CASE WHEN s.pv IS NOT NULL AND x = s.pv"
        "                    THEN s.cc + 1 ELSE 1 END) ELSE s.bc END,"
        "   'bv', CASE WHEN (CASE WHEN s.pv IS NOT NULL AND x = s.pv"
        "                    THEN s.cc + 1 ELSE 1 END) > s.bc"
        "              THEN cast(x as int) ELSE s.bv END,"
        "   'cc', CASE WHEN s.pv IS NOT NULL AND x = s.pv"
        "              THEN s.cc + 1 ELSE 1 END,"
        "   'pv', cast(x as int))).bv) as double) AS __mode",
    )
    d = "(cast(x as double) - __mean)"
    dd = f"({d} * {d})"
    binid = (
        f"least(cast((cast(x as double) - __vmin) / __rng * {N_BINS}D as int),"
        f" {N_BINS - 1})"
    )
    # Σ cbin² from ONE pass over the sorted bin ids (run-length fold with a
    # finish step for the last run) — bin counts are exact ints, so the
    # bin-order sum matches the kernel's regardless of accumulation order
    uni_runs = (
        f"aggregate(array_sort(transform({tok}, x -> {binid})),"
        " named_struct('s', 0D, 'cc', 0D, 'pv', cast(null as int)),"
        " (st, b) -> CASE WHEN st.pv IS NULL OR b != st.pv THEN"
        "   named_struct('s', st.s + st.cc * st.cc, 'cc', 1D, 'pv', cast(b as int))"
        " ELSE named_struct('s', st.s, 'cc', st.cc + 1D, 'pv', st.pv) END,"
        " st -> st.s + st.cc * st.cc)"
    )
    stage3 = stage2.selectExpr(
        "*",
        f"aggregate({tok}, 0D, (a, x) -> a + {dd}) AS __ss",
        f"(CASE WHEN __pop > 0D THEN"
        f" aggregate({tok}, 0D, (a, x) -> a + abs({d})) / __pop"
        " ELSE 0D END) AS __mad",
        f"aggregate({tok}, 0D, (a, x) -> a + {dd} * {d}) AS __m3",
        f"aggregate({tok}, 0D, (a, x) -> a + {dd} * {dd}) AS __m4",
        f"aggregate({tok}, 0D, (a, x) -> a + ({dd} * {dd}) * {d}) AS __s5",
        f"aggregate({tok}, 0D, (a, x) -> a + ({dd} * {d}) * ({dd} * {d})) AS __s6",
        f"(CASE WHEN __pop > 0D THEN"
        f" aggregate({tok}, 0D, (a, x) -> a + abs(cast(x as double) - __median))"
        " / __pop ELSE 0D END) AS __medad",
        f"(CASE WHEN __pop = 0D OR __rng = 0D THEN 0D ELSE"
        f" {uni_runs} / (__pop * __pop) END) AS __uni",
    )
    stage4 = stage3.selectExpr(
        "*",
        "(CASE WHEN __pop > 1D THEN __ss / (__pop - 1D) ELSE 0D END) AS __var",
        "(CASE WHEN __pop > 1D THEN __ss / __pop ELSE 0D END) AS __var_b",
        # TrivialHistogram machinery (histogram.h:298-327 via firstorder.py
        # _percentiles_100bin): safe bin width (kernel's safe_rng guard),
        # then the SPARSE present-bin run/cumsum table — an array of
        # (bin, count, cum) built by ONE fold over the sorted bin ids
        "(CASE WHEN __rng > 0D THEN __rng / 100.0D ELSE 0.01D END) AS __bw",
    )
    b100 = (
        f"array_sort(transform({tok}, x -> least("
        "cast((cast(x as double) - __vmin) / __bw as int), 99)))"
    )
    run_close = (
        "array_append(s.arr, named_struct('b', s.pv, 'c', s.cc,"
        " 'cum', coalesce(try_element_at(s.arr, -1).cum, 0L) + s.cc))"
    )
    stage5 = stage4.selectExpr(
        "*",
        f"aggregate({b100},"
        " named_struct('arr', cast(array() as array<struct<b:int,c:bigint,cum:bigint>>),"
        "              'pv', cast(null as int), 'cc', 0L),"
        " (s, b) -> CASE"
        "   WHEN s.pv IS NULL THEN"
        "     named_struct('arr', s.arr, 'pv', cast(b as int), 'cc', 1L)"
        "   WHEN b = s.pv THEN"
        "     named_struct('arr', s.arr, 'pv', s.pv, 'cc', s.cc + 1L)"
        f"  ELSE named_struct('arr', {run_close},"
        "                     'pv', cast(b as int), 'cc', 1L) END,"
        f" s -> CASE WHEN s.pv IS NULL THEN s.arr ELSE {run_close} END)"
        " AS __cums",
    )
    # per-percentile walk: istar = first present bin with cum > n·q (capped
    # 99); r_prev = cum of the last present bin below istar; count 0 → /1
    ist_cols, val_cols = [], []
    for nm, q in (("p01", "0.01"), ("p10", "0.1"), ("p25", "0.25"),
                  ("p75", "0.75"), ("p90", "0.9"), ("p99", "0.99")):
        ist_cols.append(
            f"least(coalesce(try_element_at(filter(__cums,"
            f" r -> cast(r.cum as double) > __pop * {q}D), 1).b, 99), 99)"
            f" AS __i{nm}"
        )
        cnt_i = (
            f"coalesce(try_element_at(filter(__cums,"
            f" r -> r.b = __i{nm}), 1).c, 0L)"
        )
        val_cols.append(
            f"(((((__pop * {q}D)"
            f" - cast(coalesce(try_element_at(filter(__cums,"
            f" r -> r.b < __i{nm}), -1).cum, 0L) as double)) * __bw)"
            f" / (CASE WHEN {cnt_i} > 0L THEN cast({cnt_i} as double)"
            f"     ELSE 1.0D END)"
            f" + __vmin) + __bw * cast(__i{nm} as double)) AS __v{nm}"
        )
    stage6 = stage5.selectExpr("*", *ist_cols).selectExpr("*", *val_cols)
    # robust band [P10, P90] (intensity.cpp:171-181): folds run over the
    # order-preserving band filter — the same masked sequential adds as the
    # kernel's seg_sum_where
    stage7 = stage6.selectExpr(
        "*",
        f"filter({tok}, x -> cast(x as double) >= __vp10"
        " AND cast(x as double) <= __vp90) AS __band",
    ).selectExpr(
        "*", "cast(size(__band) as double) AS __cb"
    ).selectExpr(
        "*",
        "(CASE WHEN __cb > 0D THEN"
        " aggregate(__band, 0D, (a, x) -> a + cast(x as double)) / __cb"
        " ELSE 0D END) AS __rmean",
    ).selectExpr(
        "*",
        "(CASE WHEN __cb > 0D THEN"
        " aggregate(__band, 0D, (a, x) -> a + abs(cast(x as double) - __rmean))"
        " / __cb ELSE 0D END) AS __rmad",
    )
    return stage7.selectExpr("*", "sqrt(__var) AS __std", "sqrt(__var_b) AS __std_b")


def sql_firstorder_exprs():
    """Final-feature expressions over the staged scalar columns —
    op-order-identical to firstorder_section (see module docstring)."""
    raw = {
        "COUNT": "__pop",
        "MIN": "__vmin",
        "MAX": "__vmax",
        "RANGE": "__rng",
        "MEAN": "__mean",
        "MEDIAN": "__median",
        "MODE": "__mode",
        "ENERGY": "__energy",
        "ROOT_MEAN_SQUARED": "sqrt(__energy / __pop)",
        "INTEGRATED_INTENSITY": "__s1",
        "MEAN_ABSOLUTE_DEVIATION": "__mad",
        "MEDIAN_ABSOLUTE_DEVIATION": "__medad",
        "VARIANCE": "__var",
        "VARIANCE_BIASED": "__var_b",
        "STANDARD_DEVIATION": "__std",
        "STANDARD_DEVIATION_BIASED": "__std_b",
        "STANDARD_ERROR": "(__std / sqrt(__pop))",
        "COV": "(__std / __mean)",
        # explicit IEEE chains — same tree as the kernel (firstorder.py)
        "SKEWNESS": (
            "(CASE WHEN __pop > 3D AND __ss > 0D"
            " THEN sqrt(__pop) * __m3 / (__ss * sqrt(__ss)) ELSE 0D END)"
        ),
        "KURTOSIS": (
            "(CASE WHEN __pop > 4D AND __ss > 0D"
            " THEN __pop * __m4 / (__ss * __ss) ELSE 0D END)"
        ),
        "EXCESS_KURTOSIS": (
            "(CASE WHEN __pop > 4D AND __ss > 0D"
            " THEN __pop * __m4 / (__ss * __ss) - 3.0D ELSE 0D END)"
        ),
        "HYPERSKEWNESS": (
            "(CASE WHEN __pop * (((__std * __std) * (__std * __std)) * __std) != 0D"
            " THEN __s5 / (__pop * (((__std * __std) * (__std * __std)) * __std))"
            " ELSE 0D END)"
        ),
        "HYPERFLATNESS": (
            "(CASE WHEN __pop * (((__std * __std) * (__std * __std))"
            " * (__std * __std)) != 0D"
            " THEN __s6 / (__pop * (((__std * __std) * (__std * __std))"
            " * (__std * __std))) ELSE 0D END)"
        ),
        "UNIFORMITY": "__uni",
        "UNIFORMITY_PIU": "((1.0D - __rng / (__vmax + __vmin)) * 100.0D)",
        "P01": "__vp01", "P10": "__vp10", "P25": "__vp25",
        "P75": "__vp75", "P90": "__vp90", "P99": "__vp99",
        # the kernel derives IQR/QCOD from the matched percentiles with
        # these exact two-step float ops (firstorder.py:174-176)
        "INTERQUARTILE_RANGE": "(__vp75 - __vp25)",
        "QCOD": "((__vp75 - __vp25) / (__vp75 + __vp25))",
        "ROBUST_MEAN": "__rmean",
        "ROBUST_MEAN_ABSOLUTE_DEVIATION": "__rmad",
    }
    # blank/empty dispatch (intensity.cpp:60-96 via firstorder.fin)
    empty = "__pop = 0D"
    blank = "__pop > 0D AND __rng = 0D"
    nan = "cast('NaN' as double)"
    blank_val = {
        "MIN": "__vmin", "MAX": "__vmax", "RANGE": "0D",
        "MEAN": "__vmin", "MEDIAN": "__vmin",
    }
    out = {}
    for name, expr in raw.items():
        if name == "COUNT":
            out[name] = F.expr(f"CASE WHEN {empty} THEN 0D ELSE __pop END")
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
    the plan is whole-stage-codegen projections over the scan (no
    exchange, no Python)."""
    feats = features or SQL_FIRSTORDER_FEATURES
    bad = [f for f in feats if f not in SQL_FIRSTORDER_FEATURES]
    if bad:
        raise ValueError(
            f"not SQL-expressible (use the kernel backend): {bad}"
        )
    staged = _staged(df, tokens_col)
    exprs = sql_firstorder_exprs()
    keep = [c for c in df.columns if keep_tokens or c != tokens_col]
    return staged.select(*keep, *[exprs[f].alias(f) for f in feats])
