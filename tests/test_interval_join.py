"""interval_join: point-into-window temporal range join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators.relations import interval_join


@pytest.fixture(scope="module")
def data(spark):
    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [("a", base + dt.timedelta(minutes=m), m) for m in (0, 10, 30, 61, 90)]
        + [("b", base + dt.timedelta(minutes=5), 500)],
        "doc_id string, ts timestamp, pid long")
    ivs = spark.createDataFrame(
        [("a", base, base + dt.timedelta(minutes=30), 1),          # [0, 30]
         ("a", base + dt.timedelta(minutes=10),
          base + dt.timedelta(minutes=95), 2),                     # [10, 95]
         ("b", base + dt.timedelta(minutes=50),
          base + dt.timedelta(minutes=60), 3)],                    # misses b's pt
        "doc_id string, start timestamp, end timestamp, iid long")
    return pts, ivs


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


def test_matches_and_boundaries_inclusive(data):
    pts, ivs = data
    got = _pairs(interval_join(pts, ivs))
    # pt 0,10,30 in window 1 (30 at the inclusive end); 10,30,61,90 in 2
    assert got == [(0, 1), (10, 1), (10, 2), (30, 1), (30, 2), (61, 2), (90, 2)]


def test_bucketed_identical_to_plain(data):
    pts, ivs = data
    plain = _pairs(interval_join(pts, ivs))
    for b in (60.0, 600.0, 7200.0):
        assert _pairs(interval_join(pts, ivs, bucket_seconds=b)) == plain


def test_no_cross_key_leak(data):
    pts, ivs = data
    got = interval_join(pts, ivs).select("doc_id", "pid", "iid").collect()
    assert all(r.doc_id == "a" for r in got)  # b's interval matches nothing


# ---------------------------------------------------------------------------
# interval_overlap_join: interval x interval
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ov_data(spark):
    base = dt.datetime(2024, 1, 1)

    def iv(key, lo_min, hi_min, iid):
        return (key, base + dt.timedelta(minutes=lo_min),
                base + dt.timedelta(minutes=hi_min), iid)

    rows = [
        iv("u1", 0, 30, 1),       # overlaps 2 (touching end), 3
        iv("u2", 30, 50, 2),      # touches 1 at minute 30 (inclusive)
        iv("u3", 10, 300, 3),     # LONG: spans many 1h buckets; hits 1,2,4
        iv("u4", 299, 310, 4),    # overlaps 3 near its end
        iv("u5", 500, 510, 5),    # overlaps nothing
    ]
    return spark.createDataFrame(
        rows, "doc_id string, start timestamp, end timestamp, iid long")


def _brute_overlap(rows):
    out = set()
    for a in rows:
        for b in rows:
            if a[3] != b[3] and a[1] <= b[2] and b[1] <= a[2]:
                out.add((a[3], b[3]))
    return out


def test_overlap_join_matches_brute_force_once_each(spark, ov_data):
    from nyxus_spark.operators.relations import interval_overlap_join

    rows = [(r.doc_id, r.start, r.end, r.iid) for r in ov_data.collect()]
    got = [(r.iid, r.iid_r)
           for r in interval_overlap_join(ov_data, ov_data).collect()
           if r.iid != r.iid_r]
    # exactly once per ordered pair, boundaries inclusive, long intervals
    # spanning many buckets do not duplicate
    assert len(got) == len(set(got))
    assert set(got) == _brute_overlap(rows)
    # bucket size must not change the result
    for b in (60.0, 900.0, 86400.0):
        got_b = [(r.iid, r.iid_r)
                 for r in interval_overlap_join(ov_data, ov_data,
                                                bucket_seconds=b).collect()
                 if r.iid != r.iid_r]
        assert len(got_b) == len(set(got_b)) and set(got_b) == set(got)
