"""Wave-47 operators: BM25 lexical relevance with the log-free rational
idf, deterministic Johnson-Lindenstrauss random projection, hard-negative
mining from k-means cells."""
import math

import pytest
from pyspark.sql import functions as F

from nyxus_spark.functions import bm25_scores
from nyxus_spark.operators.similarity import hard_negatives, random_project


# ---------------------------------------------------------------------------
# BM25 (rational idf, k1 = 6/5, b = 3/4)
# ---------------------------------------------------------------------------

def _py_bm25(rows, terms):
    """Pure-Python reference: exact integer operands, one division per
    term, sum folded in token-id order."""
    N = len(rows)
    S = sum(len(t) for _, t in rows)
    df = {t: sum(1 for _, toks in rows if t in toks) for t in terms}
    out = {}
    for doc_id, toks in rows:
        dl = len(toks)
        score = 0.0
        n_terms = 0
        tf_sum = 0
        for t in sorted(terms):
            tf = toks.count(t)
            if tf == 0:
                continue
            n_terms += 1
            tf_sum += tf
            num = (2 * N - 2 * df[t] + 1) * 44 * tf * S
            den = (2 * df[t] + 1) * (20 * tf * S + 6 * S + 18 * dl * N)
            score = score + (float(num) / float(den))
        if n_terms:
            out[doc_id] = (n_terms, tf_sum,
                           math.floor(score * 10000.0 + 0.5) / 10000.0)
    return out


def test_bm25_matches_python_reference(spark):
    rows = [
        ("doc_0", [5, 5, 5, 7, 9]),
        ("doc_1", [7, 7, 7, 7]),
        ("doc_2", [1, 2, 3]),          # no query terms → absent
        ("doc_3", [5] * 40 + [9]),     # long doc: length normalization bites
        ("doc_4", [9]),
    ]
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows], "doc_id string, tokens array<int>, n_tok int"
    )
    got = {
        r["doc_id"]: (r["bm25_terms"], r["bm25_tf"], r["bm25_score4"])
        for r in bm25_scores(df, [5, 7, 9]).collect()
    }
    assert got == _py_bm25(rows, [5, 7, 9])


def test_bm25_tf_saturation_and_length_penalty(spark):
    # same tf in a longer doc scores LOWER (b-normalization), and doubling
    # tf less than doubles the contribution (k1 saturation)
    rows = [("doc_0", [5] + [1] * 4), ("doc_1", [5] + [1] * 29),
            ("doc_2", [5, 5] + [1] * 3)]
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows], "doc_id string, tokens array<int>, n_tok int"
    )
    got = {r["doc_id"]: r["bm25_score4"] for r in bm25_scores(df, [5]).collect()}
    assert got["doc_0"] > got["doc_1"]          # length penalty
    assert got["doc_2"] < 2 * got["doc_0"]      # tf saturation


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame([("doc_0", [1], 1)],
                               "doc_id string, tokens array<int>, n_tok int")
    with pytest.raises(ValueError):
        bm25_scores(df, [])


# ---------------------------------------------------------------------------
# JL random projection (deterministic Achlioptas ±1)
# ---------------------------------------------------------------------------

MIXI, MIXJ = 1103515245, 506952114


def _sign(i: int, j: int) -> int:
    return 1 - 2 * (((i + 1) * MIXI + (j + 1) * MIXJ) % 2)


def test_random_project_matches_python(spark):
    vecs = [(0, [1, -2, 3, 0]), (1, [127, 127, -127, 5]), (2, [0, 0, 0, 0])]
    df = spark.createDataFrame(vecs, "vec_id long, q array<int>")
    got = {r["vec_id"]: [r[f"rp_{j}"] for j in range(4)]
           for r in random_project(df, d_out=4).collect()}
    for vid, q in vecs:
        want = [sum(_sign(i, j) * x for i, x in enumerate(q)) for j in range(4)]
        assert got[vid] == want
    assert got[2] == [0, 0, 0, 0]  # zero vector projects to zero


def test_random_project_is_linear(spark):
    # rp(a + b) == rp(a) + rp(b): the projection is a fixed linear map
    a, b = [3, 1, -4, 1, 5], [-2, 7, 1, -8, 2]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, [x + y for x, y in zip(a, b)])],
        "vec_id long, q array<int>",
    )
    got = {r["vec_id"]: [r[f"rp_{j}"] for j in range(8)]
           for r in random_project(df, d_out=8).collect()}
    assert got[2] == [x + y for x, y in zip(got[0], got[1])]


def test_random_project_bad_dim_raises(spark):
    df = spark.createDataFrame([(0, [1])], "vec_id long, q array<int>")
    with pytest.raises(ValueError):
        random_project(df, d_out=0)


# ---------------------------------------------------------------------------
# hard negatives (within k-means cells, below-threshold max cosine)
# ---------------------------------------------------------------------------

def _py_hard_negatives(vecs, cents, threshold):
    def n2(v):
        return sum(x * x for x in v)

    def assign(v):
        return min(cents, key=lambda c: (n2([a - b for a, b in zip(v, cents[c])]), c))

    cell = {vid: assign(v) for vid, v in vecs.items() if True}
    out = {}
    for vid, v in vecs.items():
        if n2(v) == 0:
            continue
        best = None
        for cid, c in vecs.items():
            if cid == vid or n2(c) == 0 or cell[cid] != cell[vid]:
                continue
            cos = (sum(x * y for x, y in zip(v, c))
                   / (math.sqrt(n2(v)) * math.sqrt(n2(c))))
            if cos >= threshold:
                continue
            if best is None or cos > best[1] or (cos == best[1] and cid < best[0]):
                best = (cid, cos)
        if best is not None:
            out[vid] = (best[0], math.floor(best[1] * 10000.0 + 0.5) / 10000.0)
    return out


def test_hard_negatives_matches_python(spark):
    vecs = {
        0: [10, 0, 0], 1: [0, 10, 0],          # seeds / centroids
        2: [9, 1, 0],                           # near 0's cell
        3: [10, 0, 0],                          # exact dup of 0 → cos 1.0, excluded
        4: [1, 9, 0], 5: [2, 8, 1],             # cell 1
        6: [0, 0, 0],                           # zero vector: never anchors/candidates
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, q array<int>"
    )
    seeds = spark.createDataFrame(
        [(0, vecs[0]), (1, vecs[1])], "cent_id long, cent_qvec array<int>"
    )
    got = {r["vec_id"]: (r["hn_id"], r["hn_cos4"])
           for r in hard_negatives(df, seeds, threshold=0.999).collect()}
    cents = {0: vecs[0], 1: vecs[1]}
    assert got == _py_hard_negatives(vecs, cents, 0.999)
    assert 6 not in got                       # zero vector has no row
    # 0 and 3 are exact duplicates: each one's hard negative is NOT the other
    assert got[0][0] != 3 and got[3][0] != 0


def test_hard_negatives_tie_breaks_to_lowest_id(spark):
    # two candidates at the exact same cosine → lowest id wins
    vecs = {0: [1, 0], 1: [1, 1], 2: [1, 1], 3: [2, 2]}
    df = spark.createDataFrame([(k, v) for k, v in vecs.items()],
                               "vec_id long, q array<int>")
    seeds = spark.createDataFrame([(0, [1, 1])], "cent_id long, cent_qvec array<int>")
    got = {r["vec_id"]: r["hn_id"]
           for r in hard_negatives(df, seeds, threshold=0.9999).collect()}
    # for anchor 0: candidates 1, 2, 3 all have cos = 1/sqrt(2) → pick 1
    assert got[0] == 1


def test_reciprocal_nn_flag_is_mutual(spark):
    """RNN pairs (each the other's hard negative) are exactly the symmetric
    fixed points of the hn map — the wave-64 mutual flag's law."""
    from pyspark.sql import functions as F

    vecs = {0: [10, 0, 0], 1: [0, 10, 0],
            2: [9, 1, 0], 3: [8, 2, 0], 4: [1, 9, 0]}
    df = spark.createDataFrame([(k, v) for k, v in vecs.items()],
                               "vec_id long, q array<int>")
    seeds = spark.createDataFrame(
        [(0, vecs[0]), (1, vecs[1])], "cent_id long, cent_qvec array<int>")
    hn = hard_negatives(df, seeds, threshold=0.999)
    hnm = (
        hn.alias("x")
        .join(hn.alias("y"),
              (F.col("x.hn_id") == F.col("y.vec_id"))
              & (F.col("y.hn_id") == F.col("x.vec_id")))
        .select(F.col("x.vec_id").alias("vec_id"))
    )
    hnd = {r["vec_id"]: r["hn_id"] for r in hn.collect()}
    mut = {r["vec_id"] for r in hnm.collect()}
    exp = {v for v, h in hnd.items() if hnd.get(h) == v}
    assert mut == exp
    # symmetry: a flagged id's partner is flagged too
    for v in mut:
        assert hnd[hnd[v]] == v and hnd[v] in mut


# ---------------------------------------------------------------------------
# sorted-neighborhood diagnostic (wave 48)
# ---------------------------------------------------------------------------

def _py_snm(rows):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out = {}
    prev = None
    for doc_id, toks in order:
        if prev is None:
            out[doc_id] = ("", -1, 0)
        else:
            pid, ptoks = prev
            lcp = 0
            for x, y in zip(toks, ptoks):
                if x != y:
                    break
                lcp += 1
            out[doc_id] = (pid, lcp, int(lcp == min(len(toks), len(ptoks))))
        prev = (doc_id, toks)
    return out


def test_sorted_neighborhood_matches_python(spark):
    from nyxus_spark.operators.dedup import sorted_neighborhood

    rows = [
        ("doc_0", [5, 6, 7, 8]),
        ("doc_1", [5, 6, 7, 8]),       # exact dup: adjacent, full LCP
        ("doc_2", [5, 6, 7]),          # truncation: prefix of doc_0
        ("doc_3", [6, 5, 6, 7, 8]),    # shifted head: sorts far away (the miss)
        ("doc_4", [1, 2]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: (r["snm_prev"], r["snm_lcp"], r["snm_pfx"])
           for r in sorted_neighborhood(df).collect()}
    assert got == _py_snm(rows)
    # the duplicate signal: doc_2 < doc_0 < doc_1 lexicographically, so
    # doc_0's predecessor is its own truncation and doc_1's its exact dup
    assert got["doc_0"] == ("doc_2", 3, 1)
    assert got["doc_1"] == ("doc_0", 4, 1)
    # the documented miss: the shifted doc shares nothing with its neighbor
    assert got["doc_3"][2] == 0


# ---------------------------------------------------------------------------
# MMR diversified rerank (wave 49)
# ---------------------------------------------------------------------------

def test_mmr_suppresses_redundant_candidates(spark):
    from nyxus_spark.operators.similarity import mmr_rerank

    # candidate 1 is (near-)identical to candidate 0: highest raw
    # relevance after 0, but MMR's redundancy penalty must pass it over
    # for the orthogonal candidate 2
    cands = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0.99),
            (1, [1.0, 0.001, 0.0], 0.98),   # near-copy of 0
            (2, [0.0, 1.0, 0.0], 0.60),     # diverse
            (3, [0.9, 0.1, 0.0], 0.90),     # mostly redundant with 0
        ],
        "vec_id long, embedding array<double>, cos double",
    )
    got = [(r["ordinal"], r["vec_id"])
           for r in mmr_rerank(cands, k_select=3).orderBy("ordinal").collect()]
    # step 2: the near-copy's penalized score 0.7*0.98 - 0.3*1.0 = 0.386
    # loses to the diverse candidate's 0.7*0.60 - 0.3*0 = 0.42 — checked
    # in full against a python replay of the greedy selection
    import math

    def r4(x):
        return math.floor(x * 10000.0 + 0.5) / 10000.0

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return r4(d / (na * nb))

    rows = {0: ([1.0, 0.0, 0.0], 0.99), 1: ([1.0, 0.001, 0.0], 0.98),
            2: ([0.0, 1.0, 0.0], 0.60), 3: ([0.9, 0.1, 0.0], 0.90)}
    sel = []
    for _ in range(3):
        best = None
        for vid, (v, rel) in rows.items():
            if vid in sel:
                continue
            ms = max((cos(v, rows[s][0]) for s in sel), default=0.0)
            sc = r4(0.7 * rel - 0.3 * ms)
            if best is None or sc > best[1] or (sc == best[1] and vid < best[0]):
                best = (vid, sc)
        sel.append(best[0])
    assert [v for _, v in got] == sel
    assert got[0][1] == 0                      # raw best first
    assert [v for _, v in got].index(1) > [v for _, v in got].index(2) \
        if 1 in [v for _, v in got] else True  # near-copy never before diverse


def test_mmr_rejects_bad_k(spark):
    from nyxus_spark.operators.similarity import mmr_rerank

    df = spark.createDataFrame([(0, [1.0], 1.0)],
                               "vec_id long, embedding array<double>, cos double")
    with pytest.raises(ValueError):
        mmr_rerank(df, k_select=0)


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (wave 50)
# ---------------------------------------------------------------------------

def _py_pagerank(edges, iters=4, d=0.85, base=0.15):
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({a for a, _ in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in nodes}
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nr = {}
        for v in nodes:
            # source-id-ordered sequential fold, exactly like the operator
            acc = 0.0
            for u in sorted(a for a, b in sym if b == v):
                acc = acc + r[u] / deg[u]
            nr[v] = base / n + d * acc
        r = nr
    return {v: math.floor(x * 10000.0 + 0.5) / 10000.0 for v, x in r.items()}


def test_pagerank_hub_outranks_leaves_and_matches_python(spark):
    from nyxus_spark.operators.dedup import pagerank

    # a star (hub h with 4 leaves) plus a 3-chain: the hub must outrank
    # every leaf and every chain member
    edges = [("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"),
             ("c1", "c2"), ("c2", "c3")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["doc_id"]: r["pr4"] for r in pagerank(df, iters=4).collect()}
    assert got == _py_pagerank(edges)
    assert all(got["h"] > got[f"l{i}"] for i in range(1, 5))
    assert all(got["h"] > got[c] for c in ("c1", "c2", "c3"))
    # chain ends are symmetric
    assert got["c1"] == got["c3"]


def test_pagerank_rejects_bad_iters(spark):
    from nyxus_spark.operators.dedup import pagerank

    df = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
