"""haar_cols: exact Haar band energies vs a python replay.

Laws checked:
* brute-force equality (pairwise sum/diff cascade, odd tails dropped) on
  assorted lengths including 0, 1, odd, and non-dyadic sizes;
* the un-normalized Parseval identity on dyadic lengths:
  A3 + 4·D1 + 2·D2 + D3 == 8·Σt²  (each level doubles the energy scale).
"""
from nyxus_spark.features.signal import haar_cols


def _brute(tokens, levels=3):
    cur = list(tokens)
    out = {}
    for lv in range(1, levels + 1):
        pairs = [(cur[2 * i], cur[2 * i + 1]) for i in range(len(cur) // 2)]
        out[f"haar_d{lv}"] = sum((a - b) ** 2 for a, b in pairs)
        cur = [a + b for a, b in pairs]
    out[f"haar_a{levels}"] = sum(x * x for x in cur)
    return out


def test_haar_matches_brute(spark):
    cases = [
        [],
        [7],
        [3, 5],
        [1, 2, 3],
        [10, 0, 0, 10, 5, 5],
        list(range(13)),
        [250, 0] * 8,
        [9] * 16,
    ]
    df = spark.createDataFrame(
        [(i, c, len(c)) for i, c in enumerate(cases)],
        "doc_id long, tokens array<int>, n_tok int",
    )
    got = {r["doc_id"]: r.asDict() for r in haar_cols(df).collect()}
    for i, c in enumerate(cases):
        exp = _brute(c)
        for k, v in exp.items():
            assert got[i][k] == v, f"case {i} {k}"


def test_haar_parseval_dyadic(spark):
    seqs = [list(range(8)), [5, 1, 4, 1, 5, 9, 2, 6], [17] * 8,
            list(range(32, 0, -1))]
    df = spark.createDataFrame(
        [(i, c, len(c)) for i, c in enumerate(seqs)],
        "doc_id long, tokens array<int>, n_tok int",
    )
    for r in haar_cols(df).collect():
        toks = seqs[r["doc_id"]]
        e = sum(x * x for x in toks)
        # 32-long case: levels beyond 3 leave energy in A3, law still holds
        assert (r["haar_a3"] + 4 * r["haar_d1"] + 2 * r["haar_d2"]
                + r["haar_d3"]) == 8 * e


def test_haar_levels_bound(spark):
    import pytest

    df = spark.createDataFrame([(1, [1, 2], 2)],
                               "doc_id long, tokens array<int>, n_tok int")
    with pytest.raises(ValueError):
        haar_cols(df, levels=0)
    with pytest.raises(ValueError):
        haar_cols(df, levels=6)
