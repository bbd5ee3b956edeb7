"""Two-stage int8→float rerank retrieval — pinned against a Python
reference of the full pipeline (quantize → exact int dot → top-m →
exact cosine → top-k)."""

import math
import random

import pytest

from nyxus_spark.operators.similarity import rerank_topk


def _quant(v, levels=127):
    mx = max(abs(x) for x in v)
    if mx == 0:
        return [0] * len(v)
    return [int(math.floor(levels * x / mx + 0.5)) for x in v]


def _cos4(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return math.floor(num / den * 10000.0 + 0.5) / 10000.0


def _ref_rerank(corpus, queries, k, m):
    out = {}
    q8 = {i: _quant(v) for i, v in corpus}
    for qid, qv in queries:
        qq = _quant(qv)
        s1 = sorted(((sum(a * b for a, b in zip(q8[i], qq)), i)
                     for i, _ in corpus), key=lambda t: (-t[0], t[1]))[:m]
        s2 = sorted(((_cos4(dict(corpus)[i], qv), i, sc) for sc, i in s1),
                    key=lambda t: (-t[0], t[1]))[:k]
        out[qid] = [(r + 1, i, sc, c) for r, (c, i, sc) in enumerate(s2)]
    return out


@pytest.fixture(scope="module")
def embdf(spark):
    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    return (rows,
            spark.createDataFrame(rows, "vec_id long, embedding array<float>")
            .cache())


def test_rerank_matches_reference(embdf, spark):
    rows, df = embdf
    # float32 storage: read back the values Spark actually holds
    stored = [(r.vec_id, list(r.embedding)) for r in df.collect()]
    queries_py = [(i, v) for i, v in stored if i < 3]
    qdf = spark.createDataFrame(
        [(i, v) for i, v in queries_py],
        "query_id long, query_vec array<float>")
    got = rerank_topk(df, qdf, k=5, m=12).collect()
    ref = _ref_rerank(stored, queries_py, k=5, m=12)
    assert len(got) == 15
    for r in got:
        rank, vid, sc, c4 = ref[r.query_id][r.rr_rank - 1]
        assert (r.rr_vec_id, r.rr_int8_score) == (vid, sc), \
            (r.query_id, r.rr_rank)
        assert abs(r.rr_cos4 - c4) < 1e-12


def test_rerank_winners_come_from_stage1(embdf, spark):
    rows, df = embdf
    stored = [(r.vec_id, list(r.embedding)) for r in df.collect()]
    queries_py = [(i, v) for i, v in stored if i < 3]
    qdf = spark.createDataFrame(queries_py,
                                "query_id long, query_vec array<float>")
    got = rerank_topk(df, qdf, k=3, m=8).collect()
    q8 = {i: _quant(v) for i, v in stored}
    for r in got:
        qq = _quant(dict(queries_py)[r.query_id])
        s1 = sorted(((sum(a * b for a, b in zip(q8[i], qq)), i)
                     for i, _ in stored), key=lambda t: (-t[0], t[1]))[:8]
        assert r.rr_vec_id in {i for _, i in s1}


def test_rerank_param_validation(embdf, spark):
    _rows, df = embdf
    qdf = df.limit(1).selectExpr("vec_id AS query_id",
                                 "embedding AS query_vec")
    with pytest.raises(ValueError):
        rerank_topk(df, qdf, k=10, m=5)
