"""Independent scalar reference for first-order features.

A direct, *non-vectorized* transcription of the reference semantics
(/root/reference/src/nyx/features/intensity.cpp:57-224 and
src/nyx/features/histogram.h) — one sequence at a time, plain loops.
Deliberately a different code path from nyxus_spark.features.firstorder so a
bug in the segment-vectorized kernel cannot hide in its own oracle.
Used only by tests.
"""

from __future__ import annotations

import math


def ref_firstorder(values, n_bins: int = 64, softnan: float = math.nan) -> dict[str, float]:
    v = [float(x) for x in values]
    n = len(v)
    out: dict[str, float] = {"COUNT": float(n)}
    if n == 0:
        for k in _ALL:
            out.setdefault(k, softnan)
        out["COUNT"] = 0.0
        return out
    vmin, vmax = min(v), max(v)
    rng = vmax - vmin
    if rng == 0:  # blank-ROI intercept (intensity.cpp:60-96)
        out.update({"MIN": vmin, "MAX": vmax, "RANGE": 0.0, "MEAN": vmin, "MEDIAN": vmin})
        for k in _ALL:
            out.setdefault(k, softnan)
        return out

    mean = sum(v) / n
    energy = sum(x * x for x in v)
    d = [x - mean for x in v]
    ss = sum(x * x for x in d)
    var = ss / (n - 1) if n > 1 else 0.0
    var_b = ss / n if n > 1 else 0.0
    std = math.sqrt(var)
    out.update(
        MIN=vmin, MAX=vmax, RANGE=rng, MEAN=mean, ENERGY=energy,
        ROOT_MEAN_SQUARED=math.sqrt(energy / n), INTEGRATED_INTENSITY=sum(v),
        MEAN_ABSOLUTE_DEVIATION=sum(abs(x) for x in d) / n,
        VARIANCE=var, VARIANCE_BIASED=var_b,
        STANDARD_DEVIATION=std, STANDARD_DEVIATION_BIASED=math.sqrt(var_b),
        STANDARD_ERROR=std / math.sqrt(n), COV=std / mean,
    )
    m3 = sum(x ** 3 for x in d)
    m4 = sum(x ** 4 for x in d)
    out["SKEWNESS"] = (math.sqrt(n) * m3 / ss ** 1.5) if n > 3 and ss > 0 else 0.0
    out["KURTOSIS"] = (n * m4 / (ss * ss)) if n > 4 and ss > 0 else 0.0
    out["EXCESS_KURTOSIS"] = out["KURTOSIS"] - 3.0 if n > 4 and ss > 0 else 0.0
    s5 = sum(x ** 5 for x in d)
    s6 = sum(x ** 6 for x in d)
    den5, den6 = n * std ** 5, n * std ** 6
    out["HYPERSKEWNESS"] = s5 / den5 if den5 != 0 else 0.0
    out["HYPERFLATNESS"] = s6 / den6 if den6 != 0 else 0.0

    # --- TrivialHistogram (histogram.h) ---
    binw = rng / 100.0
    bins100 = [0] * 101
    for x in v:
        bins100[int((x - vmin) / binw)] += 1
    bins100[99] += bins100[100]
    bins100 = bins100[:100]
    pct = {}
    for name, q in [("P01", .01), ("P10", .1), ("P25", .25), ("P75", .75), ("P90", .9), ("P99", .99)]:
        cnt = n * q
        run = 0
        val = 0.0
        for i in range(100):
            if run <= cnt <= run + bins100[i]:
                val = (cnt - run) * binw / bins100[i] + vmin + binw * i if bins100[i] else val
            run += bins100[i]
        pct[name] = val
    out.update(pct)
    out["INTERQUARTILE_RANGE"] = pct["P75"] - pct["P25"]
    out["QCOD"] = (pct["P75"] - pct["P25"]) / (pct["P75"] + pct["P25"])

    cb = [0] * (n_bins + 1)
    for x in v:
        cb[int((x - vmin) / rng * n_bins)] += 1
    cb[n_bins - 1] += cb[n_bins]
    cb = cb[:n_bins]
    ent = 0.0
    uni = 0.0
    for c in cb:
        p = c / n
        ent += p * math.log2(p + 2.2e-16)
        uni += p * p
    out["ENTROPY"] = -ent
    out["UNIFORMITY"] = uni
    out["UNIFORMITY_PIU"] = (1.0 - (vmax - vmin) / (vmax + vmin)) * 100.0

    sv = sorted(v)
    out["MEDIAN"] = sv[n // 2] if n % 2 else (sv[n // 2 - 1] + sv[n // 2]) / 2.0
    freq: dict[float, int] = {}
    for x in sv:
        freq[x] = freq.get(x, 0) + 1
    best = sv[0]
    for val_ in sorted(freq):
        if freq[val_] > freq[best]:
            best = val_
    out["MODE"] = best

    band = [x for x in v if pct["P10"] <= x <= pct["P90"]]
    if band:
        bm = sum(band) / len(band)
        out["ROBUST_MEAN"] = bm
        out["ROBUST_MEAN_ABSOLUTE_DEVIATION"] = sum(abs(x - bm) for x in band) / len(band)
    else:
        out["ROBUST_MEAN"] = 0.0
        out["ROBUST_MEAN_ABSOLUTE_DEVIATION"] = 0.0
    med = out["MEDIAN"]
    out["MEDIAN_ABSOLUTE_DEVIATION"] = sum(abs(x - med) for x in v) / n
    return out


_ALL = [
    "MIN", "MAX", "RANGE", "MEAN", "MEDIAN", "MODE", "ENERGY", "ROOT_MEAN_SQUARED",
    "INTEGRATED_INTENSITY", "MEAN_ABSOLUTE_DEVIATION", "MEDIAN_ABSOLUTE_DEVIATION",
    "VARIANCE", "VARIANCE_BIASED", "STANDARD_DEVIATION", "STANDARD_DEVIATION_BIASED",
    "STANDARD_ERROR", "COV", "SKEWNESS", "KURTOSIS", "EXCESS_KURTOSIS",
    "HYPERSKEWNESS", "HYPERFLATNESS", "ENTROPY", "UNIFORMITY", "UNIFORMITY_PIU",
    "P01", "P10", "P25", "P75", "P90", "P99", "INTERQUARTILE_RANGE", "QCOD",
    "ROBUST_MEAN", "ROBUST_MEAN_ABSOLUTE_DEVIATION",
]
