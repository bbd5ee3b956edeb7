"""Huffman coding bound + UniMax allocation — pure-Python replays.

The Spark paths are applyInPandas over the per-group dim; these tests replay
the same algorithms independently (a different code path: explicit
code-length assignment for Huffman, a brute loop for UniMax) and check the
invariants the driver gate relies on.
"""

import heapq
import random

from pyspark.sql import functions as F

from nyxus_spark.functions.coding import huffman_bits, unimax_allocation


def _huff_codelens(counts):
    """Independent replay: explicit code-length computation (merge trees,
    tracking leaf depths) — different from the kernel's cost-sum identity."""
    if len(counts) == 1:
        return {next(iter(counts)): 0}
    heap = []
    for i, (t, c) in enumerate(sorted(counts.items())):
        heap.append((c, i, {t: 0}))
    heapq.heapify(heap)
    nxt = len(heap)
    while len(heap) > 1:
        c1, _, d1 = heapq.heappop(heap)
        c2, _, d2 = heapq.heappop(heap)
        merged = {t: d + 1 for t, d in d1.items()}
        merged.update({t: d + 1 for t, d in d2.items()})
        heapq.heappush(heap, (c1 + c2, nxt, merged))
        nxt += 1
    return heap[0][2]


def test_huffman_matches_codelen_replay(spark):
    rng = random.Random(7)
    rows = []
    expected = {}
    for g in range(6):
        vocab = rng.randint(1, 40)
        toks = []
        counts = {}
        for t in range(vocab):
            c = rng.randint(1, 30)
            counts[t] = c
            toks.extend([t] * c)
        rng.shuffle(toks)
        src = f"g{g}"
        rows.append((src, toks))
        lens = _huff_codelens(counts)
        expected[src] = (
            sum(counts[t] * lens[t] for t in counts),
            len(counts),
            sum(counts.values()),
        )
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = {
        r["source"]: (r["huff_bits"], r["huff_vocab"], r["huff_mass"])
        for r in huffman_bits(df).collect()
    }
    assert got == expected


def test_huffman_edge_cases(spark):
    df = spark.createDataFrame(
        [("one", [5, 5, 5]), ("two", [1, 2, 2])],
        "source string, tokens array<int>",
    )
    got = {r["source"]: r["huff_bits"] for r in huffman_bits(df).collect()}
    # single symbol: 0 bits (degenerate WPL); two symbols: 1 bit each → mass
    assert got == {"one": 0, "two": 3}


def test_unimax_invariants(spark):
    rng = random.Random(11)
    masses = [(f"s{i}", rng.randint(10, 5000)) for i in range(12)]
    df = spark.createDataFrame(masses, "source string, total_tokens long")
    total = sum(m for _, m in masses)
    budget = total  # mid-regime: some saturate at 2 epochs, some don't
    out = {
        r["source"]: (r["um_cap"], r["um_alloc"])
        for r in unimax_allocation(df, budget=budget, epoch_cap=2).collect()
    }
    # brute replay
    rows = sorted((2 * m, g) for g, m in masses)
    r, k = budget, len(rows)
    exp = {}
    for cap, g in rows:
        a = min(cap, r // k)
        r -= a
        k -= 1
        exp[g] = (cap, a)
    assert out == exp
    assert all(a <= c for c, a in out.values())
    spent = sum(a for _, a in out.values())
    assert spent <= budget
    # unless EVERY group saturated, the floor-division leftovers are < |G|
    if any(a < c for c, a in out.values()):
        assert budget - spent < len(masses) * 2  # floors leak < 1/group/step


def test_unimax_all_saturate(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 20)], "source string, total_tokens long"
    )
    out = {
        r["source"]: r["um_alloc"]
        for r in unimax_allocation(df, budget=10**9, epoch_cap=3).collect()
    }
    assert out == {"a": 30, "b": 60}


def test_temperature_alpha_sweep_ordering(spark):
    """rate_α is monotone in α for sub-maximal strata: α=0.25 flattest."""
    from nyxus_spark.functions import temperature_rates

    df = spark.createDataFrame(
        [(f"s{i}", i) for i in range(1, 5) for _ in range(10 * i)],
        "source string, m int",
    )
    r25 = temperature_rates(df, "source", alpha=0.25)
    r50 = temperature_rates(df, "source", alpha=0.5)
    r75 = temperature_rates(df, "source", alpha=0.75)
    r100 = temperature_rates(df, "source", alpha=1.0)
    for s in ("s1", "s2", "s3"):
        assert r100[s] <= r75[s] <= r50[s] <= r25[s] <= 1.0
    assert r25["s4"] == r50["s4"] == r75["s4"] == r100["s4"] == 1.0
    # α = 0.75 is the exact chain sqrt(n·sqrt(n))
    import math

    n, mx = 10.0, 40.0
    assert r75["s1"] == math.sqrt(n * math.sqrt(n)) / math.sqrt(
        mx * math.sqrt(mx))


def test_doc_level_huffman_bounds(spark):
    """Doc-level Huffman bits obey the Shannon-free sandwich:
    0 <= huff_bits <= mass * ceil(log2(vocab)) with equality at vocab<=2."""
    import math
    import random

    from nyxus_spark.functions.coding import huffman_bits

    rng = random.Random(5)
    rows = []
    for d in range(12):
        v = rng.randint(1, 30)
        toks = [rng.randint(0, v - 1) for _ in range(rng.randint(1, 80))]
        rows.append((f"d{d}", toks))
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    for r in huffman_bits(df).collect():
        vocab, mass, bits = r["huff_vocab"], r["huff_mass"], r["huff_bits"]
        if vocab == 1:
            assert bits == 0
        else:
            fixed = mass * math.ceil(math.log2(vocab))
            assert 0 < bits <= fixed
            if vocab == 2:
                assert bits == mass
