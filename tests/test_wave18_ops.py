"""Wave-18 operators: quota sampling, per-source token association, and the
cross-source n-gram leakage monitor — pinned against Python references."""

import random
from collections import Counter

import pytest

import pyspark.sql.functions as F

from nyxus_spark.functions.text import (
    cross_source_leakage,
    quota_sample,
    source_assoc_top,
)

P31 = 2147483647


def _hash(i, mix):
    return ((i % P31) * (mix % P31)) % P31


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(21)
    rows = []
    for i in range(120):
        src = f"s{i % 3}"
        n = rng.randint(0, 25)
        # skew the vocab per source so association is non-trivial
        lo = (i % 3) * 3
        toks = [rng.randrange(lo, lo + 12) for _ in range(n)]
        rows.append((i, src, toks))
    return spark.createDataFrame(
        rows, "doc_id long, source string, tokens array<int>").cache()


def test_quota_sample_exact_k(corpus):
    out = quota_sample(corpus, k=7).collect()
    per_src = Counter(r.source for r in out if r.quota_keep == 1)
    for src in ("s0", "s1", "s2"):
        assert per_src[src] == 7
    # rank is a 1..n permutation within each stratum
    ranks = {}
    for r in out:
        ranks.setdefault(r.source, []).append(r.quota_rank)
    for src, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))


def test_quota_sample_matches_reference_order(corpus):
    rows = corpus.collect()
    out = {r.doc_id: (r.quota_rank, r.quota_keep)
           for r in quota_sample(corpus, k=5, mix=1103515245).collect()}
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.doc_id)
    for src, ids in by_src.items():
        order = sorted(ids, key=lambda i: (_hash(i, 1103515245), i))
        for rank, i in enumerate(order, 1):
            assert out[i] == (rank, 1 if rank <= 5 else 0), (src, i)


def test_quota_nested_in_k(corpus):
    k3 = {r.doc_id for r in quota_sample(corpus, k=3).collect()
          if r.quota_keep == 1}
    k9 = {r.doc_id for r in quota_sample(corpus, k=9).collect()
          if r.quota_keep == 1}
    assert k3 < k9


def test_quota_validation(corpus):
    with pytest.raises(ValueError):
        quota_sample(corpus, k=0)


def test_source_assoc_matches_reference(corpus):
    rows = corpus.collect()
    cts, ct, cs, n_all = Counter(), Counter(), Counter(), 0
    for r in rows:
        for t in r.tokens:
            cts[(r.source, t)] += 1
            ct[t] += 1
            cs[r.source] += 1
            n_all += 1
    got = {r.source: r for r in source_assoc_top(corpus, min_count=2).collect()}
    for src in ("s0", "s1", "s2"):
        cand = [(t, c) for (s, t), c in cts.items() if s == src and c >= 2]
        best = max(cand, key=lambda tc: (tc[1] * n_all / (ct[tc[0]] * cs[src]),
                                         -tc[0]))
        g = got[src]
        assert g.top_assoc_token == best[0], src
        assert g.assoc_cts == best[1]
        assert g.assoc_ct == ct[best[0]]
        assert g.assoc_cs == cs[src]
        # the lift key actually separates sources (skewed vocab fixture)
        assert g.lift4 > 1.0


def test_source_assoc_min_count_excludes_singletons(spark):
    # a token seen once in one source has huge lift but must be excluded
    df = spark.createDataFrame(
        [(0, "a", [1, 1, 1, 2]), (1, "b", [1, 1, 99])],
        "doc_id long, source string, tokens array<int>")
    got = {r.source: r.top_assoc_token
           for r in source_assoc_top(df, min_count=2).collect()}
    assert got["b"] != 99  # 99 occurs once -> filtered


def test_cross_source_leakage_reference(spark):
    # s0 and s1 share the run [1..8]; s2 is disjoint
    shared = list(range(1, 9))
    df = spark.createDataFrame(
        [(0, "s0", shared + [20, 21, 22, 23, 24, 25, 26, 27]),
         (1, "s1", [30] + shared),
         (2, "s2", list(range(40, 56)))],
        "doc_id long, source string, tokens array<int>")
    got = {r.source: r for r in cross_source_leakage(df, n=8).collect()}
    # python reference
    rows = df.collect()
    grams = {}
    for r in rows:
        t = list(r.tokens)
        gs = {tuple(t[i:i + 8]) for i in range(len(t) - 7)}
        grams[r.source] = gs
    for src, gs in grams.items():
        leaked = sum(1 for g in gs
                     if any(g in o for s2, o in grams.items() if s2 != src))
        assert got[src].grams_total == len(gs), src
        assert got[src].grams_leaked == leaked, src
    assert got["s0"].grams_leaked >= 1
    assert got["s2"].grams_leaked == 0
    assert got["s2"].leak_frac4 == 0.0


def test_cross_source_leakage_short_docs(spark):
    df = spark.createDataFrame(
        [(0, "a", [1, 2, 3]), (1, "b", [1, 2, 3])],
        "doc_id long, source string, tokens array<int>")
    # no 8-grams at all -> no rows (sources contribute zero distinct grams)
    assert cross_source_leakage(df, n=8).count() == 0
    got = {r.source: r for r in cross_source_leakage(df, n=3).collect()}
    assert got["a"].grams_total == 1 and got["a"].grams_leaked == 1


def test_leakage_validation(corpus):
    with pytest.raises(ValueError):
        cross_source_leakage(corpus, n=0)
    with pytest.raises(ValueError):
        source_assoc_top(corpus, min_count=0)
