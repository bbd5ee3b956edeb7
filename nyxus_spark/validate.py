"""Temporal-leakage validation (north rule: "zero temporal leakage verified at
each entity×timestamp").

Two independent checks:

* `assert_no_leakage` — structural: no output row's matched version may be
  later than its probe timestamp. O(n) scan, zero false negatives for
  backward as-of semantics.
* `assert_truncation_invariant` — behavioral: recompute the join with all
  versions after a cutoff removed; matches for probes at/before the cutoff
  must be identical. Catches subtle leaks the structural check cannot (e.g.
  a feature computed from a later version but stamped with an earlier ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_no_leakage(out: DataFrame, ts_col: str = "ts", matched_col: str = "matched_ts") -> int:
    """Raise if any matched version is later than its probe ts. Returns the
    number of rows validated."""
    leaks = out.filter(F.col(matched_col) > F.col(ts_col)).count()
    if leaks:
        raise AssertionError(f"temporal leakage: {leaks} rows with {matched_col} > {ts_col}")
    return out.count()


def assert_truncation_invariant(
    probes: DataFrame,
    versions: DataFrame,
    join_fn,
    cutoff,
    ts_col: str = "ts",
    compare_cols: list[str] | None = None,
) -> int:
    """Recompute `join_fn(probes≤cutoff, versions)` vs
    `join_fn(probes≤cutoff, versions≤cutoff)` and require identical results.
    `join_fn(probes, versions) -> DataFrame` is the pipeline under test."""
    p_early = probes.filter(F.col(ts_col) <= F.lit(cutoff))
    full = join_fn(p_early, versions)
    trunc = join_fn(p_early, versions.filter(F.col(ts_col) <= F.lit(cutoff)))
    cols = compare_cols or full.columns
    a = full.select(cols).exceptAll(trunc.select(cols)).count()
    b = trunc.select(cols).exceptAll(full.select(cols)).count()
    if a or b:
        raise AssertionError(
            f"truncation variance: {a}+{b} rows differ when versions after the "
            "cutoff are removed — features at (doc, ts) depend on data after ts"
        )
    return full.count()
