"""functions/encoding.py: LOO/smoothed target encoding, group z-score,
percentile rank + winsorization — python-reference parity and edge laws."""

import math

import pytest

from nyxus_spark.functions.encoding import (
    group_standardize,
    loo_target_encode,
    percentile_clip,
)


def _r4(x):
    return math.floor(x * 10000.0 + 0.5) / 10000.0


@pytest.fixture(scope="module")
def encoded(spark):
    rows = []
    vals = {"a": [100, 200, 300, None, 400], "b": [50, None, None],
            "c": [700], "d": [None, None]}
    i = 0
    for cat, vs in vals.items():
        for v in vs:
            rows.append((i, cat, v))
            i += 1
    df = spark.createDataFrame(rows, "rid long, cat string, target long")
    got = loo_target_encode(df, "cat", "target", m=20).toPandas()
    return rows, got.set_index("rid")


def test_loo_matches_python(encoded):
    rows, got = encoded
    sums = {}
    for _, cat, v in rows:
        if v is not None:
            s, n = sums.get(cat, (0, 0))
            sums[cat] = (s + v, n + 1)
    gs = sum(s for s, _ in sums.values())
    gn = sum(n for _, n in sums.values())
    for rid, cat, v in rows:
        s, n = sums.get(cat, (0, 0))
        r = got.loc[rid]
        assert r["te_n"] == n
        if v is not None and n > 1:
            assert r["te_loo4"] == _r4((s - v) / (n - 1))
        else:
            assert r["te_loo4"] is None or math.isnan(r["te_loo4"])
        assert r["te_sm4"] == _r4((s * gn + 20 * gs) / ((n + 20) * gn))


def test_loo_excludes_own_row(encoded):
    rows, got = encoded
    # category 'a': sums 1000 over 4; row with 100 -> (1000-100)/3 = 300
    rid = next(r for r, c, v in rows if c == "a" and v == 100)
    assert got.loc[rid]["te_loo4"] == 300.0


def test_empty_category_gets_global_mean(encoded):
    rows, got = encoded
    rid = next(r for r, c, v in rows if c == "d")
    gs, gn = 1750, 6
    assert got.loc[rid]["te_sm4"] == _r4((0 * gn + 20 * gs) / (20 * gn))
    assert got.loc[rid]["te_n"] == 0


def test_group_standardize_matches_python(spark):
    import statistics

    data = [("s1", v) for v in [3, 7, 7, 10, 23]] + [("s2", v) for v in [5, 5]]
    df = spark.createDataFrame(
        [(i, s, v) for i, (s, v) in enumerate(data)], "rid long, g string, v long")
    got = group_standardize(df, "g", "v", prefix="g").toPandas().set_index("rid")
    s1 = [3, 7, 7, 10, 23]
    mu, sd = statistics.mean(s1), statistics.stdev(s1)
    for i, (g, v) in enumerate(data):
        if g == "s1":
            # same chain: (n·x − S)/(n·sqrt(v/(n(n−1))))
            n, S = 5, sum(s1)
            vv = n * sum(x * x for x in s1) - S * S
            z = (n * v - S) / (n * math.sqrt(vv / (n * (n - 1))))
            assert got.loc[i]["g_z4"] == _r4(z)
            assert abs(z - (v - mu) / sd) < 1e-9  # algebraically the z-score
        else:  # constant group -> NULL
            assert got.loc[i]["g_z4"] is None or math.isnan(got.loc[i]["g_z4"])


def test_percentile_clip_matches_python(spark):
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "rid long, g string, v long")
    got = percentile_clip(df, "g", "v").toPandas().set_index("rid")
    n = len(vals)
    sv = sorted(vals)
    lo = sv[max(1, (n * 10) // 100) - 1]
    hi = sv[max(1, (n * 90) // 100) - 1]
    assert (got["src_lo" if "src_lo" in got else "pc_lo"] == lo).all()
    assert (got["pc_hi"] == hi).all()
    for i, v in enumerate(vals):
        rk = 1 + sum(1 for x in vals if x < v)
        assert got.loc[i]["pc_rank4"] == _r4((rk - 1) / (n - 1))
        assert got.loc[i]["pc_wins"] == max(lo, min(hi, v))


def test_validation(spark):
    df = spark.createDataFrame([("a", 1)], "cat string, target long")
    with pytest.raises(ValueError):
        loo_target_encode(df, "cat", "target", m=0)
    with pytest.raises(ValueError):
        percentile_clip(df, "cat", "target", lo_pct=90, hi_pct=10)
