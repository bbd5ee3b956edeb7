"""Coding-theoretic corpus planning primitives.

Huffman optimal prefix-code cost per group (the entropy-free compression
bound — pairs with the LZ78 actual parse cost already gated in text_stats),
and the UniMax epoch-capped mixture allocation (Chung et al. 2023: uniform
budget waterfilling with a per-source repetition cap — the log-free,
exactly-integer mixture designer).

Reference parity note: nyxus has no compression planner; these belong to the
LLM-data-pipeline extension surface (brief §"training-data pipeline").
Everything here is exact integer arithmetic so the DuckDB oracles replay it
bit-for-bit (Huffman's total cost is tie-break-INVARIANT — every optimal
prefix code has the same weighted length — so the gate does not depend on
heap ordering details; the implementation still fixes (weight, id) ordering
for determinism of intermediate states).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def huffman_bits(
    df: DataFrame,
    group_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-group Huffman-optimal total code length in bits.

    Counts token frequencies per group, then runs the classic two-smallest
    merge per group inside ONE applyInPandas stage (groups are few — the
    per-source dim — and vocab is small; the count table, not the corpus,
    enters Python). Returns one row per group:

      huff_bits  — Σ over merge steps of the merged weight == the minimal
                   Σ_t c_t·len(code_t) over all prefix codes (exact BIGINT);
                   0 for a single-symbol group (the degenerate WPL).
      huff_vocab — distinct tokens in the group.
      huff_mass  — total tokens in the group (Σ c_t).

    The merge order is (weight, id) lexicographic with internal nodes
    numbered from 2^20 in creation order — deterministic, though huff_bits
    itself is invariant to any valid tie-break.
    """
    cnt = (
        df.select(group_col, F.explode(tokens_col).alias("tok"))
        .groupBy(group_col, "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    schema = (
        f"{group_col} string, huff_bits long, huff_vocab long, huff_mass long"
    )

    def _merge(key, pdf):
        import heapq

        import pandas as pd

        heap = sorted(
            (int(w), int(t)) for w, t in zip(pdf["c"], pdf["tok"])
        )
        vocab = len(heap)
        mass = int(pdf["c"].sum())
        heapq.heapify(heap)
        bits = 0
        nxt = 1 << 20  # internal-node ids above any token id
        while len(heap) > 1:
            w1, _ = heapq.heappop(heap)
            w2, _ = heapq.heappop(heap)
            m = w1 + w2
            bits += m
            heapq.heappush(heap, (m, nxt))
            nxt += 1
        return pd.DataFrame(
            {
                group_col: [key[0]],
                "huff_bits": [bits],
                "huff_vocab": [vocab],
                "huff_mass": [mass],
            }
        )

    return cnt.groupBy(group_col).applyInPandas(_merge, schema)


def unimax_allocation(
    masses: DataFrame,
    budget: int,
    epoch_cap: int = 2,
    group_col: str = "source",
    mass_col: str = "total_tokens",
) -> DataFrame:
    """UniMax epoch-capped uniform budget waterfilling — exact integers.

    Given per-group token masses m_g and a total training budget B, allocate
    as uniformly as possible subject to a repetition cap of `epoch_cap`
    epochs per group: visiting groups in ASCENDING (cap, group) order,

        alloc_g = min(epoch_cap·m_g, R // k)

    where R is the remaining budget and k the remaining group count (both
    updated after each visit). Small groups saturate at their cap; the slack
    flows to the larger groups — the UniMax shape, floor-division exact so
    the DuckDB oracle replays it step-for-step (one recursion per group).

    The whole fold runs in ONE single-group applyInPandas over the per-group
    dim (|groups| rows — broadcast-tiny by construction, never the corpus).
    Returns (group, um_cap, um_alloc) with um_alloc ≤ um_cap and
    Σ um_alloc ≤ B (equality unless every group saturates).
    """
    if budget < 0 or epoch_cap <= 0:
        raise ValueError("budget must be >= 0 and epoch_cap >= 1")
    schema = f"{group_col} string, um_cap long, um_alloc long"
    cap_i = int(epoch_cap)
    budget_i = int(budget)

    def _fill(pdf):
        import pandas as pd

        rows = sorted(
            (cap_i * int(m), str(g))
            for g, m in zip(pdf[group_col], pdf[mass_col])
        )
        out_g, out_cap, out_alloc = [], [], []
        r = budget_i
        k = len(rows)
        for cap, g in rows:
            alloc = min(cap, r // k)
            r -= alloc
            k -= 1
            out_g.append(g)
            out_cap.append(cap)
            out_alloc.append(alloc)
        return pd.DataFrame(
            {group_col: out_g, "um_cap": out_cap, "um_alloc": out_alloc}
        )

    one = masses.select(group_col, mass_col).withColumn("__g1", F.lit(1))
    return one.groupBy("__g1").applyInPandas(
        lambda key, pdf: _fill(pdf), schema
    )
