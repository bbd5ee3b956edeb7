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


# ---------------------------------------------------------------------------
# CUSUM changepoint statistics (wave 53)
# ---------------------------------------------------------------------------

def test_cusum_matches_recursion_and_detects_shift(spark):
    from nyxus_spark.operators.windows import with_cusum

    # level shift at t=5: x jumps from ~10 to ~14 vs ref 10 — c+ must grow
    # linearly after the shift while the isolated dip at t=2 decays
    xs = [10, 11, 7, 10, 10, 14, 15, 14, 15, 14]
    df = spark.createDataFrame(
        [("k", i, x, 10) for i, x in enumerate(xs)],
        "g string, t long, x long, ref long",
    )
    got = {r["t"]: (r["cusum_pos"], r["cusum_neg"])
           for r in with_cusum(df, "x", "ref", "g", "t").collect()}
    cp = cn = 0
    for i, x in enumerate(xs):
        cp = max(0, cp + (x - 10))
        cn = max(0, cn + (10 - x))
        assert got[i] == (cp, cn), f"t={i}"
    assert got[9][0] >= 16          # sustained shift accumulated
    assert got[4][0] == 0           # pre-shift: no upward accumulation
    assert got[4][1] == 3           # the t=2 dip holds (x == ref neither
                                    # grows nor decays a CUSUM)


def test_cusum_is_per_partition(spark):
    from nyxus_spark.operators.windows import with_cusum

    df = spark.createDataFrame(
        [("a", 0, 15, 10), ("b", 0, 10, 10)],
        "g string, t long, x long, ref long",
    )
    got = {r["g"]: r["cusum_pos"]
           for r in with_cusum(df, "x", "ref", "g", "t").collect()}
    assert got == {"a": 5, "b": 0}  # no cross-partition bleed


# ---------------------------------------------------------------------------
# cohort retention (wave 53)
# ---------------------------------------------------------------------------

def test_cohort_retention_counts(spark):
    from pyspark.sql import functions as F

    from nyxus_spark.operators.windows import cohort_retention

    day = 86_400_000_000
    rows = [
        # users u1, u2 join day 0; u1 returns day 1; u2 returns day 2
        ("u1", 0), ("u1", day + 5), ("u2", 3), ("u2", 2 * day),
        # u3 joins day 1, never returns
        ("u3", day + 9),
        # duplicate activity same day must not double-count
        ("u1", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts_us long").select(
        "doc_id", F.timestamp_micros("ts_us").alias("ts"))
    first, cells = cohort_retention(df)
    f = {r["u"]: r["cohort_d"] for r in first.collect()}
    d0 = min(f.values())
    assert f["u1"] == f["u2"] == d0 and f["u3"] == d0 + 1
    c = {(r["cohort_d"] - d0, r["offset_d"]): (r["cell_users"], r["cohort_users"])
         for r in cells.collect()}
    assert c[(0, 0)] == (2, 2)      # day-0 cohort: both active at offset 0
    assert c[(0, 1)] == (1, 2)      # u1 retained next day
    assert c[(0, 2)] == (1, 2)      # u2 retained on day 2
    assert c[(1, 0)] == (1, 1)      # u3's cohort of one
    assert (1, 1) not in c          # u3 never returns


# ---------------------------------------------------------------------------
# ordered funnel (wave 54)
# ---------------------------------------------------------------------------

def test_funnel_strict_order_and_stages(spark):
    from pyspark.sql import functions as F

    from nyxus_spark.operators.windows import funnel_stages

    m = 60_000_000
    rows = [
        # u1 completes the full funnel in order
        ("u1", 1 * m, "view"), ("u1", 2 * m, "click"), ("u1", 3 * m, "purchase"),
        # u2: purchase BEFORE click — stage stops at click (strict order)
        ("u2", 1 * m, "view"), ("u2", 2 * m, "purchase"), ("u2", 3 * m, "click"),
        # u3: click only, never viewed — stage 0 (step 1 gates the rest)
        ("u3", 1 * m, "click"),
        # u4: view then a SIMULTANEOUS click (ts equal) — strict > excludes
        ("u4", 1 * m, "view"), ("u4", 1 * m, "click"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, us long, event_type string") \
        .select("doc_id", F.timestamp_micros("us").alias("ts"), "event_type")
    got = {r["doc_id"]: (r["funnel_stage"], r["f_ts_0"], r["f_ts_1"], r["f_ts_2"])
           for r in funnel_stages(df, ["view", "click", "purchase"]).collect()}
    assert got["u1"] == (3, 1 * m, 2 * m, 3 * m)
    assert got["u2"] == (2, 1 * m, 3 * m, -1)   # purchase@2m was too early
    assert "u3" not in got                       # no step-0 event → absent
    assert got["u4"] == (1, 1 * m, -1, -1)       # equal ts is NOT after


def test_funnel_empty_steps_raises(spark):
    import pytest

    from nyxus_spark.operators.windows import funnel_stages

    df = spark.createDataFrame([("u", 0, "view")],
                               "doc_id string, us long, event_type string")
    with pytest.raises(ValueError):
        funnel_stages(df, [])
