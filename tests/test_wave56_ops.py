"""Wave-56 operator: per-key inter-arrival point-process diagnostics
(Goh–Barabási burstiness, lag-1 memory coefficient, hourly Fano factor)
vs an independent pure-Python reference, including degenerate keys."""
import datetime
import math

from nyxus_spark.operators.windows import interarrival_stats


def _r4(x):
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _ref(ts_us):
    """Pure-Python reference on a key's epoch-µs list."""
    ts = sorted(ts_us)
    g = [(b - a) // 1_000_000 for a, b in zip(ts, ts[1:])]
    out = {
        "ia_n_gaps": len(g),
        "ia_sum_s": sum(g) if g else None,
        "ia_max_s": max(g) if g else None,
        "ia_burstiness": None,
        "ia_memory": None,
    }
    n = len(g)
    if n >= 2:
        s, q = sum(g), sum(x * x for x in g)
        k = n * q - s * s
        if s > 0 or k > 0:
            out["ia_burstiness"] = _r4(
                (math.sqrt(k) - float(s)) / (math.sqrt(k) + float(s))
            )
    pairs = list(zip(g, g[1:]))
    m = len(pairs)
    if m >= 2:
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        qa = sum(a * a for a, _ in pairs)
        qb = sum(b * b for _, b in pairs)
        p = sum(a * b for a, b in pairs)
        k1, k2 = m * qa - sa * sa, m * qb - sb * sb
        if k1 > 0 and k2 > 0:
            out["ia_memory"] = _r4(
                float(m * p - sa * sb) / (math.sqrt(k1) * math.sqrt(k2))
            )
    hrs = [t // 3_600_000_000 for t in ts]
    nh = max(hrs) - min(hrs) + 1
    cnt = {}
    for h in hrs:
        cnt[h] = cnt.get(h, 0) + 1
    ntot = len(ts)
    q2 = sum(c * c for c in cnt.values())
    out["ia_fano_hourly"] = _r4(float(nh * q2 - ntot * ntot) / float(nh * ntot))
    return out


def test_interarrival_matches_python_reference(spark):
    base = 1_700_000_000_000_000  # epoch µs
    keys = {
        # regular train: gaps all 60 s → burstiness -1, fano ~ sub-Poisson
        "regular": [base + i * 60_000_000 for i in range(10)],
        # bursty: tight cluster then a huge silence then a cluster
        "bursty": [base, base + 1_000_000, base + 2_000_000,
                   base + 86_400_000_000, base + 86_401_000_000],
        # alternating short/long gaps → negative memory
        "alternating": [base, base + 5_000_000, base + 305_000_000,
                        base + 310_000_000, base + 610_000_000,
                        base + 615_000_000],
        # degenerate: one event (no gaps), two events (one gap)
        "single": [base],
        "pair": [base, base + 42_000_000],
        # all events at the SAME µs: gaps all 0 → burstiness undefined (0/0)
        "ties": [base, base, base],
    }
    rows = [
        (k, datetime.datetime.utcfromtimestamp(t / 1e6), i)
        for k, ts in keys.items()
        for i, t in enumerate(ts)
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, event_id int")
    got = {
        r["doc_id"]: r.asDict()
        for r in interarrival_stats(df, "doc_id", "ts").collect()
    }
    assert set(got) == set(keys)
    for k, ts in keys.items():
        ref = _ref(ts)
        for col, want in ref.items():
            have = got[k][col]
            assert have == want, f"{k}.{col}: got {have}, want {want}"

    # spot-check the semantics: the regular train is maximally regular,
    # the bursty one strongly bursty, alternation gives negative memory
    assert got["regular"]["ia_burstiness"] == -1.0
    # finite-size bound: max B over 4 gaps is (√3−1)/(√3+1) ≈ 0.268 — the
    # bursty train sits essentially AT the bound
    assert got["bursty"]["ia_burstiness"] > 0.26
    assert got["alternating"]["ia_memory"] < -0.9
    assert got["ties"]["ia_burstiness"] is None
    assert got["single"]["ia_n_gaps"] == 0 and got["single"]["ia_sum_s"] is None
    # Fano: 10 events inside 10 distinct-minute hours... regular spans 1 hour
    # with all 10 events in it → nh=1, F=(1*100-100)/(1*10)=0 (deterministic)
    assert got["regular"]["ia_fano_hourly"] == 0.0
