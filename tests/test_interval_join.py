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
