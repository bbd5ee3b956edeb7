"""lrs_capped vs a brute-force O(n^3) longest-repeated-substring replay."""

import random

from nyxus_spark.functions import lrs_capped


def _brute_lrs(toks, cap):
    n = len(toks)
    best = 0
    for i in range(n):
        for j in range(i + 1, n):
            k = 0
            while (i + k < n and j + k < n and k < cap
                   and toks[i + k] == toks[j + k]):
                k += 1
            best = max(best, k)
    return best


def test_lrs_matches_bruteforce(spark):
    rng = random.Random(42)
    rows = []
    exp = {}
    for d in range(30):
        n = rng.randint(1, 60)
        # small alphabet → lots of genuine repeats
        toks = [rng.randint(0, 5) for _ in range(n)]
        # salt in one long literal repeat for a few docs
        if d % 5 == 0 and n >= 20:
            seg = toks[:7]
            toks[10:17] = seg
        rows.append((f"doc_{d}", toks, len(toks)))
        exp[f"doc_{d}"] = _brute_lrs(toks, 8)
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    )
    got = {r["doc_id"]: r["lrs8"] for r in lrs_capped(df, cap=8).collect()}
    assert got == exp


def test_lrs_cap_saturates(spark):
    # a 12-token repeat reported as min(12, cap)
    toks = list(range(12)) + [99] + list(range(12))
    df = spark.createDataFrame(
        [("d", toks, len(toks))], "doc_id string, tokens array<int>, n_tok int"
    )
    assert lrs_capped(df, cap=8).collect()[0]["lrs8"] == 8
    assert lrs_capped(df, cap=64).collect()[0]["lrs64"] == 12


def test_lrs_no_repeat_and_single(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3, 4], 4), ("b", [7], 1)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    got = {r["doc_id"]: r["lrs64"] for r in lrs_capped(df).collect()}
    assert got == {"a": 0, "b": 0}
