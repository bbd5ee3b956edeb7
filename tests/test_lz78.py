"""functions.lz78_phrases: python parity + compressibility laws."""

import pytest

from nyxus_spark.functions.text import lz78_phrases


def _py_lz78(toks):
    d = set()
    cur = []
    ph = 0
    for t in toks:
        cur.append(str(t))
        key = ",".join(cur)
        if key not in d:
            d.add(key)
            ph += 1
            cur = []
    if cur:
        ph += 1
    return ph


def test_matches_python_reference(spark):
    docs = [
        [1] * 16, [1, 2] * 8, list(range(16)),
        [(i * 37) % 11 for i in range(50)],
        [5], [3, 3], [7] * 7, [],
        [(i * i) % 13 for i in range(100)],
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, tokens array<int>")
    got = {r.doc_id: r.ph
           for r in df.select("doc_id", lz78_phrases().alias("ph")).collect()}
    assert got == {i: _py_lz78(d) for i, d in enumerate(docs)}


def test_compressibility_ordering(spark):
    """The filter's point: constant ≪ periodic < random phrase counts."""
    n = 64
    docs = {"const": [9] * n, "period": [1, 2, 3, 4] * (n // 4),
            "random": [(i * 2654435761) % 251 for i in range(n)]}
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, tokens array<int>")
    got = {r.doc_id: r.ph
           for r in df.select("doc_id", lz78_phrases().alias("ph")).collect()}
    assert got["const"] < got["period"] < got["random"]
    # LZ78 law: k full phrases of a constant stream cover k(k+1)/2 tokens
    k = got["const"]
    assert (k - 1) * k // 2 < n <= k * (k + 1) // 2
