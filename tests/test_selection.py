"""skyline_flags: Pareto-front membership vs a brute-force dominance check.

Covers ties on one axis, exact duplicate points (neither dominates the
other — both stay on the frontier), a fully dominated interior, and a
single-point frame.
"""
import itertools

from nyxus_spark.operators import skyline_flags


def _brute(points):
    flags = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for j, (qx, qy) in enumerate(points) if j != i
        )
        flags.append(0 if dominated else 1)
    return flags


def _run(spark, points):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)], "id long, x long, y long"
    )
    got = {
        r["id"]: r["on_skyline"]
        for r in skyline_flags(df, "x", "y").collect()
    }
    exp = _brute(points)
    assert [got[i] for i in range(len(points))] == exp
    return exp


def test_skyline_mixed(spark):
    pts = [(5, 1), (4, 4), (1, 5), (3, 3), (4, 4), (2, 2), (5, 1), (0, 0)]
    exp = _run(spark, pts)
    # both copies of every duplicate frontier point survive
    assert exp[1] == exp[4] == 1
    assert exp[0] == exp[6] == 1
    assert exp[3] == exp[5] == exp[7] == 0


def test_skyline_ties_on_x(spark):
    # same x, different y: only the max-y row (and its duplicates) survive
    pts = [(3, 1), (3, 2), (3, 3), (3, 3)]
    exp = _run(spark, pts)
    assert exp == [0, 0, 1, 1]


def test_skyline_monotone_chain(spark):
    # a strictly trading-off staircase: every point is on the frontier
    pts = [(i, 10 - i) for i in range(11)]
    assert _run(spark, pts) == [1] * 11


def test_skyline_single_and_grid(spark):
    assert _run(spark, [(7, 7)]) == [1]
    grid = list(itertools.product(range(4), range(4)))
    exp = _run(spark, grid)
    # only (3, 3) is undominated in a full grid
    assert sum(exp) == 1 and exp[grid.index((3, 3))] == 1


def test_skyline_column_contract(spark):
    df = spark.createDataFrame([(1, 2, 3, "z")], "id long, x long, y long, tag string")
    out = skyline_flags(df, "x", "y")
    assert out.columns == ["id", "x", "y", "tag", "on_skyline"]
