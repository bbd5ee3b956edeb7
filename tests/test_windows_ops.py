"""with_rolling: last-K-rows and event-time-range frames vs pandas."""

import datetime as dt

import pandas as pd
import pytest

from nyxus_spark.operators import with_rolling


@pytest.fixture(scope="module")
def rolled(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in ("a", "b"):
        for i in range(10):
            rows.append((d, base + dt.timedelta(minutes=30 * i), i,
                         None if i % 3 == 0 else (i + 1) * 100))
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, event_id long, cents long")
    got = with_rolling(df, "cents", n_rows=3, range_us=3_600_000_000,
                       tiebreak="event_id").toPandas()
    return got.sort_values(["doc_id", "event_id"]).reset_index(drop=True)


def test_rows_frame_matches_pandas(rolled):
    for _, g in rolled.groupby("doc_id"):
        s = g["cents"].astype("float64")
        assert g["roll3_sum_cents"].astype("float64").equals(
            s.rolling(3, min_periods=1).sum().where(lambda x: x.notna()))
        exp_n = s.rolling(3, min_periods=1).count()
        assert (g["roll3_count_cents"].to_numpy() == exp_n.to_numpy()).all()
        assert g["roll3_min_cents"].astype("float64").equals(
            s.rolling(3, min_periods=1).min())
        assert g["roll3_max_cents"].astype("float64").equals(
            s.rolling(3, min_periods=1).max())


def test_range_frame_is_time_based(rolled):
    # 1 h range at 30-min spacing covers the current row + 2 previous rows
    for _, g in rolled.groupby("doc_id"):
        s = g["cents"].astype("float64")
        assert g["rollr3600000000us_sum_cents"].astype("float64").equals(
            s.rolling(3, min_periods=1).sum().where(lambda x: x.notna()))


def test_rolling_validation(spark):
    df = spark.createDataFrame([("a", 1)], "doc_id string, cents long")
    with pytest.raises(ValueError):
        with_rolling(df, "cents")
    with pytest.raises(ValueError):
        with_rolling(df, "cents", n_rows=0)
    with pytest.raises(ValueError):
        with_rolling(df, "cents", range_us=-1)
