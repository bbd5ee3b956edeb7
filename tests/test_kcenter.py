"""greedy_kcenter: farthest-point-first selection vs a brute-force replay.

The operator works on already-quantized integer vectors, so the reference
is plain integer arithmetic — centers, assignment, and distances must match
exactly, including both tie-break rules (farthest ties -> lowest id;
assignment ties -> lowest center id).
"""
import pytest

from nyxus_spark.operators.similarity import greedy_kcenter


def _brute(vecs: dict, k: int):
    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    centers = [min(vecs)]
    for _ in range(k - 1):
        far = max(
            vecs,
            key=lambda v: (min(d2(vecs[v], vecs[c]) for c in centers), -v),
        )
        centers.append(far)
    out = {}
    for v, x in vecs.items():
        best = min((d2(x, vecs[c]), c) for c in centers)
        out[v] = (best[1], best[0])
    return centers, out


def _run(spark, vecs, k):
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in vecs.items()], "vec_id long, qv array<int>"
    )
    got = {r["vec_id"]: (r["kc_cent"], r["kc_d"])
           for r in greedy_kcenter(df, k=k).collect()}
    _, exp = _brute(vecs, k)
    assert got == exp


def test_kcenter_line(spark):
    # points on a line: greedy picks the extremes first
    vecs = {i: [10 * i, 0] for i in range(8)}
    _run(spark, vecs, k=3)


def test_kcenter_clusters_and_ties(spark):
    vecs = {
        0: [0, 0], 1: [1, 0], 2: [0, 1],        # cluster A (seed here)
        10: [100, 100], 11: [101, 100],          # cluster B
        20: [-100, 100], 21: [-100, 101],        # cluster C (same far dist as B
        #                                           by symmetry -> lowest id wins)
        30: [0, -100],
    }
    _run(spark, vecs, k=4)


def test_kcenter_duplicates(spark):
    # duplicate of the seed: zero distance, assigned to the seed center
    vecs = {0: [5, 5], 1: [5, 5], 2: [50, 0], 3: [0, 50]}
    _run(spark, vecs, k=2)


def test_kcenter_k_bounds(spark):
    df = spark.createDataFrame([(0, [1, 2])], "vec_id long, qv array<int>")
    with pytest.raises(ValueError):
        greedy_kcenter(df, k=1)
    with pytest.raises(ValueError):
        greedy_kcenter(df, k=17)


# -- hypothesis property: random integer vectors vs the brute replay
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _vec_case(draw):
    dim = draw(st.integers(min_value=1, max_value=4))
    n = draw(st.integers(min_value=2, max_value=16))
    vecs = draw(st.lists(
        st.tuples(*[st.integers(min_value=-9, max_value=9)] * dim),
        min_size=n, max_size=n))
    k = draw(st.integers(min_value=2, max_value=min(4, n)))
    return {i: list(v) for i, v in enumerate(vecs)}, k


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_vec_case())
def test_kcenter_random_property(spark, case):
    vecs, k = case
    _run(spark, vecs, k)
