"""Wave-76 operator: per-key Mann–Kendall S + Theil–Sen lower-median slope
over daily event counts vs a pure-Python reference, including degenerate
keys (single active day → no pairs)."""
import datetime

from nyxus_spark.operators.windows import trend_stats


def _ref(day_counts):
    """Pure-Python MK/TS on a {day: count} dict."""
    items = sorted(day_counts.items())
    pairs = [
        (di, dj, ci, cj)
        for i, (di, ci) in enumerate(items)
        for (dj, cj) in items[i + 1:]
    ]
    s = sum(1 if cj > ci else -1 if cj < ci else 0 for _, _, ci, cj in pairs)
    slopes = sorted((cj - ci) / (dj - di) for di, dj, ci, cj in pairs)
    med = slopes[(len(slopes) + 1) // 2 - 1] if slopes else None
    return {
        "mk_s": s,
        "mk_pairs": len(pairs),
        "mk_sign": (s > 0) - (s < 0),
        "ts_slope": med,
    }


def _ts(day, i):
    return datetime.datetime(2024, 1, 1 + day, 0, min(i, 59), 0)


def test_trend_stats_matches_python_reference(spark):
    # u1: strictly rising 1,2,3,4 events over days 0..3 — S = +6, slope 1.0
    # u2: falling 3,1 over days 0,4 — S = -1, slope -0.5
    # u3: flat 2,2,2 — S = 0, sign 0, slope 0.0
    # u4: single day — no pairs, NULL slope
    # u5: non-monotone 1,3,2 over days 0,1,5
    fixture = {
        "u1": {0: 1, 1: 2, 2: 3, 3: 4},
        "u2": {0: 3, 4: 1},
        "u3": {0: 2, 2: 2, 4: 2},
        "u4": {1: 7},
        "u5": {0: 1, 1: 3, 5: 2},
    }
    rows = []
    for u, dc in fixture.items():
        for d, c in dc.items():
            for i in range(c):
                rows.append((u, _ts(d, i), len(rows)))
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, event_id int")
    got = {r["doc_id"]: r.asDict() for r in trend_stats(df).collect()}
    assert set(got) == set(fixture)
    for u, dc in fixture.items():
        exp = _ref(dc)
        g = got[u]
        assert g["mk_s"] == exp["mk_s"], u
        assert g["mk_pairs"] == exp["mk_pairs"], u
        assert g["mk_sign"] == exp["mk_sign"], u
        if exp["ts_slope"] is None:
            assert g["ts_slope"] is None, u
        else:
            assert g["ts_slope"] == exp["ts_slope"], u
