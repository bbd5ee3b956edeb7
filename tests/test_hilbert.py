"""hilbert_key: xy2d parity, bijection, adjacency, and square-block laws."""

import pytest

from nyxus_spark.functions import hilbert_key


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_python_xy2d(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321),
            (32768, 0), (0, 32768), (65535, 0)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select(
        "a", "b",
        hilbert_key("cast(a as bigint)", "cast(b as bigint)").alias("h"),
    ).collect()
    for r in got:
        assert r.h == _xy2d(1 << 16, r.a, r.b)
    with pytest.raises(ValueError):
        hilbert_key("a", "b", bits=32)


def test_bijection_and_adjacency(spark):
    """The Hilbert curve's defining locality law: over the full 2^k × 2^k
    grid the key is a bijection onto [0, 4^k) and CONSECUTIVE keys are
    always grid-adjacent (Manhattan distance exactly 1) — the property the
    Morton curve lacks at block seams."""
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.select(
        "a", "b",
        hilbert_key("cast(a as bigint)", "cast(b as bigint)", bits=4).alias("h"),
    ).collect()
    byh = {r.h: (r.a, r.b) for r in out}
    assert sorted(byh) == list(range(256))
    for h in range(255):
        (a0, b0), (a1, b1) = byh[h], byh[h + 1]
        assert abs(a1 - a0) + abs(b1 - b0) == 1, (h, byh[h], byh[h + 1])


def test_aligned_blocks_are_squares(spark):
    """Aligned blocks of 4^m consecutive Hilbert keys are exact 2^m × 2^m
    SQUARES — tighter than z-order's rectangles (which can be 2^a × 2^b)."""
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.select(
        "a", "b",
        (hilbert_key("cast(a as bigint)", "cast(b as bigint)", bits=5) / 16)
        .cast("long").alias("hb"),  # buckets of 16 keys = 4x4 squares
    ).collect()
    ext = {}
    for r in out:
        lo = ext.setdefault(r.hb, [r.a, r.a, r.b, r.b])
        lo[0] = min(lo[0], r.a); lo[1] = max(lo[1], r.a)
        lo[2] = min(lo[2], r.b); lo[3] = max(lo[3], r.b)
    for hb, (a0, a1, b0, b1) in ext.items():
        assert a1 - a0 == 3 and b1 - b0 == 3, (hb, ext[hb])
        assert a0 % 4 == 0 and b0 % 4 == 0, (hb, ext[hb])


def test_oracle_cte_chain_matches_spark(spark):
    """The DuckDB unrolled-CTE replay produces the identical key (the
    list_reduce fold is deliberately avoided: DuckDB 1.0 mis-vectorizes
    accumulator-dependent CASE branches across rows)."""
    import duckdb
    import pandas as pd

    from nyxus_spark.oracles import sql_hilbert_ctes

    rows = [(i, (i * 37) % 65536, (i * 101) % 65536) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    got = {
        r.k: r.h
        for r in df.select(
            "k", hilbert_key("cast(a as bigint)", "cast(b as bigint)").alias("h")
        ).collect()
    }
    con = duckdb.connect()
    con.register("pts", pd.DataFrame(rows, columns=["k", "a", "b"]))
    ctes = sql_hilbert_ctes("pts", "k", "a", "b", 16)
    exp = dict(con.execute(f"WITH {ctes} SELECT hk, h32 FROM hilbert").fetchall())
    assert got == {k: int(v) for k, v in exp.items()}
