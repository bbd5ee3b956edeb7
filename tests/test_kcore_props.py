"""kcore_peel property tests: the bounded R-round peel must equal a
pure-Python replay of the same recursion on randomized graphs (chains,
cliques, stars, mixtures), and must equal the TRUE k-core whenever the
peel converges within R rounds."""
import random

from nyxus_spark.operators.dedup import kcore_peel


def _py_peel(edges, k, rounds):
    """R-round peel, same semantics as the operator."""
    und = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    surv = set(und)
    for _ in range(rounds):
        deg = {
            v: sum(1 for w in und[v] if w in surv)
            for v in surv
        }
        surv = {v for v, d in deg.items() if d >= k}
    deg = {v: sum(1 for w in und[v] if w in surv) for v in surv}
    return surv, deg, set(und)


def _graph(seed):
    rng = random.Random(seed)
    edges = set()
    base = 0
    # a chain (peels away at k=2), a clique (survives), a star
    n_chain = rng.randint(2, 8)
    for i in range(n_chain - 1):
        edges.add((base + i, base + i + 1))
    base += n_chain
    n_cl = rng.randint(3, 6)
    for i in range(n_cl):
        for j in range(i + 1, n_cl):
            edges.add((base + i, base + j))
    base += n_cl
    hub = base
    for i in range(rng.randint(2, 5)):
        edges.add((hub, base + 1 + i))
    base += 7
    # random extra edges knitting the parts together
    for _ in range(rng.randint(0, 6)):
        a, b = rng.randrange(base), rng.randrange(base)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def test_kcore_matches_python_replay(spark):
    for seed in (11, 23, 47):
        edges = _graph(seed)
        df = spark.createDataFrame(
            [(f"d{a}", f"d{b}") for a, b in edges], "id_a string, id_b string"
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in kcore_peel(df, ks=(2, 3), rounds=4).collect()
        }
        s2, d2, nodes = _py_peel(edges, 2, 4)
        s3, _, _ = _py_peel(edges, 3, 4)
        assert set(got) == {f"d{v}" for v in nodes}, seed
        for v in nodes:
            g = got[f"d{v}"]
            assert g["core2"] == (1 if v in s2 else 0), (seed, v)
            assert g["core3"] == (1 if v in s3 else 0), (seed, v)
            assert g["core2_deg"] == d2.get(v, 0), (seed, v)


def test_kcore_converged_equals_true_kcore(spark):
    # clique + pendant: peel depth 1 << rounds, so the bounded peel IS the
    # true 2-core (the clique), and the pendant chain is fully removed
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(
        [(f"d{a}", f"d{b}") for a, b in edges], "id_a string, id_b string"
    )
    got = {r["doc_id"]: r.asDict() for r in kcore_peel(df, ks=(2,), rounds=4).collect()}
    assert {v for v in got if got[v]["core2"] == 1} == {"d0", "d1", "d2"}
    assert got["d0"]["core2_deg"] == 2
    assert got["d4"]["core2"] == 0 and got["d4"]["core2_deg"] == 0
