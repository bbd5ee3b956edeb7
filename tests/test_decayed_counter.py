"""with_decayed_counter: exact dyadic time-decayed counters vs a python replay."""

import datetime as dt

import pytest

from nyxus_spark.operators import with_decayed_counter

HL = 1_800_000_000  # 30 min in µs


def _py_decay(events, now_us, half_life_us=HL, age_cap=20, n_rows=32):
    """events: list of (us, v) in frame order (trailing n_rows incl. now)."""
    frame = events[-n_rows:]
    num = 0
    for u, v in frame:
        if v is None:
            continue
        age = min((now_us - u) // half_life_us, age_cap)
        num += v * (1 << (age_cap - age))
    return num


@pytest.fixture(scope="module")
def decayed(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in ("a", "b"):
        for i in range(40):
            # irregular spacing: 0, 7, 14, ... minutes with an occasional
            # multi-half-life gap; nulls every 4th event
            mins = 7 * i + (300 if i >= 20 else 0)
            rows.append((d, base + dt.timedelta(minutes=mins), i,
                         None if i % 4 == 0 else (i + 1) * 10))
    df = spark.createDataFrame(
        rows, "doc_id string, ts timestamp, event_id long, cents long")
    got = with_decayed_counter(df, "cents", half_life_us=HL,
                               tiebreak="event_id").toPandas()
    return rows, got.sort_values(["doc_id", "event_id"]).reset_index(drop=True)


def test_numerator_matches_python_replay(decayed):
    rows, got = decayed
    by_doc = {}
    for d, ts, eid, v in rows:
        by_doc.setdefault(d, []).append((int(ts.timestamp() * 1_000_000), v))
    for _, r in got.iterrows():
        hist = by_doc[r["doc_id"]][: int(r["event_id"]) + 1]
        assert int(r["dk30m_num_cents"]) == _py_decay(hist, hist[-1][0])


def test_value_is_scaled_numerator(decayed):
    _, got = decayed
    assert (got["dk30m_cents"] * float(1 << 20) ==
            got["dk30m_num_cents"].astype("float64")).all()


def test_halving_law(spark):
    """A single observation's counter halves after exactly one half-life."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", base, 0, 1000), ("a", base + dt.timedelta(minutes=30), 1, None),
         ("a", base + dt.timedelta(minutes=60), 2, None)],
        "doc_id string, ts timestamp, event_id long, cents long")
    got = (with_decayed_counter(df, "cents", half_life_us=HL)
           .orderBy("event_id").toPandas())
    assert list(got["dk30m_cents"]) == [1000.0, 500.0, 250.0]
    assert list(got["dk30m_n_cents"]) == [1, 1, 1]


def test_age_cap_zeroes_ancient_history(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", base, 0, 1 << 40),
         ("a", base + dt.timedelta(minutes=30 * 21), 1, None)],
        "doc_id string, ts timestamp, event_id long, cents long")
    got = (with_decayed_counter(df, "cents", half_life_us=HL)
           .orderBy("event_id").toPandas())
    # age 21 clamps to the cap: weight 2^0 = 1, i.e. numerator == v exactly
    assert int(got["dk30m_num_cents"][1]) == 1 << 40


def test_frame_bound_drops_old_rows(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("a", base + dt.timedelta(seconds=i), i, 100) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id string, ts timestamp, event_id long, cents long")
    got = (with_decayed_counter(df, "cents", half_life_us=HL, n_rows=32)
           .orderBy("event_id").toPandas())
    # all events within one half-life: weight 2^20 each, count capped at 32
    assert int(got["dk30m_n_cents"].iloc[-1]) == 32
    assert int(got["dk30m_num_cents"].iloc[-1]) == 32 * 100 * (1 << 20)


def test_validation(spark):
    df = spark.createDataFrame([("a", 1)], "doc_id string, cents long")
    with pytest.raises(ValueError):
        with_decayed_counter(df, "cents", half_life_us=0)
    with pytest.raises(ValueError):
        with_decayed_counter(df, "cents", half_life_us=HL, age_cap=63)
