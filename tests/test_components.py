"""connected_components: multi-hop label propagation + convergence."""

from pyspark.sql import functions as F

from nyxus_spark.operators.dedup import connected_components


def test_chain_and_islands(spark):
    # path a-b-c-d (diameter 3 → needs >1 propagation round), triangle
    # x-y-z, and an isolated pair p-q
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("x", "y"), ("y", "z"), ("x", "z"),
         ("p", "q")],
        "id_a string, id_b string",
    )
    got = {
        r["doc_id"]: r["rep"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "p": "p", "q": "p",
    }


def test_long_chain_converges(spark):
    # 12-node path: rep must reach the far end through iteration
    ids = [f"n{i:02d}" for i in range(12)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "id_a string, id_b string"
    )
    out = connected_components(pairs)
    reps = out.select(F.collect_set("rep").alias("s")).first()["s"]
    assert reps == ["n00"]
    assert out.count() == 12


def test_nonconvergence_raises(spark):
    # min-label propagation advances one hop per round; a chain deeper than
    # max_iter must RAISE, never silently return split clusters
    import pytest

    ids = [f"n{i:02d}" for i in range(8)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "id_a string, id_b string"
    )
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(pairs, max_iter=2)
    # and a sufficient bound on the same graph succeeds
    assert connected_components(pairs, max_iter=10).count() == 8


def _union_find(n, edges):
    """Reference CC: textbook union-find with path compression."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical rep = min node id in component (matches min-label semantics)
    comp = {}
    for v in range(n):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_random_graphs_vs_union_find(spark):
    # deterministic pseudo-random graphs: chains, stars, cliques, and mixed
    # sparse edges — labels must equal the union-find reference exactly
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(6):
        n = rng.randrange(10, 40)
        edges = set()
        # a chain segment (deep diameter), a star, a clique, random extras
        chain = rng.sample(range(n), k=min(n, 8))
        edges.update(zip(chain, chain[1:]))
        hub = rng.randrange(n)
        edges.update((hub, rng.randrange(n)) for _ in range(4))
        cl = rng.sample(range(n), k=4)
        edges.update((a, b) for a in cl for b in cl if a < b)
        edges.update(
            (rng.randrange(n), rng.randrange(n)) for _ in range(n // 3)
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        expected = _union_find(n, edges)
        touched = {v for e in edges for v in e}
        pairs = spark.createDataFrame(
            [(f"v{a:03d}", f"v{b:03d}") for a, b in edges],
            "id_a string, id_b string",
        )
        got = {
            int(r["doc_id"][1:]): int(r["rep"][1:])
            for r in connected_components(pairs).collect()
        }
        assert got == {v: expected[v] for v in touched}, (trial, sorted(edges))
