"""IH family + positional moments vs scalar transcriptions of the reference
algorithm (/root/reference/src/nyx/features/intensity_histogram.cpp:31-310)."""

import math

import numpy as np
import pytest

from nyxus_spark.features.ih import IH_FEATURES, ih_section
from nyxus_spark.features.moments import MOMENTS_FEATURES, moments_section
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

RNG = np.random.RandomState(3)
CASES = [
    [1, 2, 5, 2, 3, 3, 2, 1, 3, 1, 1, 3, 5, 5, 2, 1, 1, 1, 1, 2, 1, 2, 4, 3, 5],
    list(RNG.randint(0, 251, size=333)),
    list(RNG.randint(0, 50257, size=101)),
    [0, 1] * 25,
    [9],
    [4, 4, 4],
]


def ih_ref(values, N):
    """Direct scalar transcription of intensity_histogram.cpp compute()."""
    count = len(values)
    if count == 0 or min(values) == max(values):
        return None
    vmin, vmax = float(min(values)), float(max(values))
    bw = (vmax - vmin) / N
    freq = [0.0] * N
    for v in values:
        i = int(math.floor((v - vmin) / bw))
        freq[max(0, min(i, N - 1))] += 1.0

    def bin_min(i):
        return vmin + i * bw

    def bin_center(i):
        return vmin + (i + 0.5) * bw

    def get_index_of(value):
        return max(0, min(int(math.floor((value - vmin) / bw)), N - 1))

    def quantile(p):
        if p < 0.5:
            cum, p_n, n = 0.0, 0.0, 0
            while True:
                f_n = freq[n]
                cum += f_n
                p_prev, p_n = p_n, cum / count
                n += 1
                if not (n < N and p_n < p):
                    break
            return bin_min(n - 1) + ((p - p_prev) / (f_n / count)) * bw
        cum, p_n, n, m = 0.0, 1.0, N - 1, 0
        while True:
            f_n = freq[n]
            cum += f_n
            p_prev, p_n = p_n, 1.0 - cum / count
            n -= 1
            m += 1
            if not (m < N and p_n > p):
                break
        return (bin_min(n + 1) + bw) - ((p_prev - p) / (f_n / count)) * bw

    half = float(count // 2)
    tot, b = 0.0, 0
    while tot <= half and b < N:
        tot += freq[b]
        b += 1
    median_val = bin_center(b - 1)

    p10v, p25v, p75v, p90v = quantile(.1), quantile(.25), quantile(.75), quantile(.9)
    p10i, p90i = get_index_of(p10v), get_index_of(p90v)
    mean_v = sum(freq[i] / count * bin_center(i) for i in range(N))
    mean_i = sum(freq[i] / count * i for i in range(N))
    rc = sum(freq[i] for i in range(p10i, p90i + 1))
    rmean_v = sum(freq[i] * bin_center(i) for i in range(p10i, p90i + 1)) / rc
    var_v = sum(freq[i] / count * (bin_center(i) - mean_v) ** 2 for i in range(N))
    var_i = sum(freq[i] / count * (i - mean_i) ** 2 for i in range(N))
    skew_v = sum(freq[i] / count * (bin_center(i) - mean_v) ** 3 for i in range(N)) / (var_v * math.sqrt(var_v))
    kurt_v = sum(freq[i] / count * (bin_center(i) - mean_v) ** 4 for i in range(N)) / var_v ** 2 - 3
    mode_i = max(range(N), key=lambda i: (freq[i], -i))
    ent = -sum(
        (freq[i] / count) * math.log(freq[i] / count) / math.log(2)
        for i in range(N) if freq[i] / count > 1e-7
    )
    uni = sum((freq[i] / count) ** 2 for i in range(N))
    grads = []
    for i in range(N):
        if i == 0:
            grads.append(freq[1] - freq[0])
        elif i == N - 1:
            grads.append(freq[i] - freq[i - 1])
        else:
            grads.append((freq[i + 1] - freq[i - 1]) / 2.0)
    return {
        "IH_MEAN_VAL": mean_v, "IH_VARIANCE_VAL": var_v, "IH_SKEWNESS_VAL": skew_v,
        "IH_EXCESS_KURTOSIS_VAL": kurt_v, "IH_MEDIAN_VAL": median_val,
        "IH_P10_VAL": p10v, "IH_P90_VAL": p90v,
        "IH_INTERQUANTILE_RANGE_VAL": p75v - p25v,
        "IH_MODE_IDX": mode_i + 1.0, "IH_ENTROPY_VAL": ent, "IH_UNIFORMITY_VAL": uni,
        "IH_ROBUST_MEAN_VAL": rmean_v, "IH_MEAN_IDX": mean_i + 1.0,
        "IH_VARIANCE_IDX": var_i, "IH_BIN_SIZE": bw,
        "IH_MAX_GRADIENT": max(max(grads), 2.2250738585072014e-308),
        "IH_MIN_GRADIENT": min(grads),
    }


def test_ih_vs_scalar_transcription():
    s = FeatureSettings()
    got = ih_section(Segments([np.array(c) for c in CASES]), s)
    for i, c in enumerate(CASES):
        exp = ih_ref(c, s.n_bins)
        if exp is None:
            for f in IH_FEATURES:
                assert math.isnan(got[f][i]), f"{f} row{i}"
            continue
        for f, e in exp.items():
            g = got[f][i]
            assert np.isclose(g, e, rtol=1e-9, atol=1e-12), f"{f} row{i}: {g} != {e}"


def test_moments_scalar():
    vals = [3, 0, 7, 1]
    got = moments_section(Segments([np.array(vals)]), FeatureSettings())
    w = vals
    m0 = sum(w)
    m1 = sum(i * x for i, x in enumerate(w))
    c = m1 / m0
    mu2 = sum(x * (i - c) ** 2 for i, x in enumerate(w))
    assert got["MOM_RAW_0"][0] == m0
    assert got["MOM_RAW_1"][0] == m1
    assert np.isclose(got["MOM_WEIGHTED_CENTROID"][0], c)
    assert np.isclose(got["MOM_CENTRAL_2"][0], mu2)
    assert np.isclose(got["MOM_NORM_CENTRAL_2"][0], mu2 / m0 ** 2)
    # shape variant: nonzero positions 0,2,3
    sc = (0 + 2 + 3) / 3
    assert np.isclose(got["MOM_SHAPE_CENTROID"][0], sc)


def test_moments_round4_codes_scalar():
    """Round-4 codes (normalized raw, HU4-HU6, shape HU4/HU5) vs direct
    scalar formulas."""
    vals = [3, 0, 7, 1, 5, 2]
    got = moments_section(Segments([np.array(vals)]), FeatureSettings())
    w = vals
    m = [sum(x * i ** p for i, x in enumerate(w)) for p in range(5)]
    c = m[1] / m[0]
    mu = {p: sum(x * (i - c) ** p for i, x in enumerate(w)) for p in (2, 3, 4)}
    eta = {p: mu[p] / m[0] ** (1 + p / 2) for p in (2, 3, 4)}
    for p in (1, 2, 3, 4):
        assert np.isclose(got[f"MOM_NORM_RAW_{p}"][0], m[p] / m[0] ** (1 + p / 2))
    assert np.isclose(got["MOM_HU_4"][0], mu[4] / mu[2] ** 2)
    assert np.isclose(got["MOM_HU_5"][0], mu[3] ** 2 / mu[2] ** 3)
    assert np.isclose(got["MOM_HU_6"][0], eta[2] * eta[4] - eta[3] ** 2)
    # shape family over nonzero positions
    nz = [i for i, x in enumerate(w) if x != 0]
    s = [sum(i ** p for i in nz) for p in range(5)]
    scen = s[1] / s[0]
    smu = {p: sum((i - scen) ** p for i in nz) for p in (2, 3, 4)}
    for p in (1, 2, 3, 4):
        assert np.isclose(got[f"MOM_SHAPE_NORM_RAW_{p}"][0], s[p] / s[0] ** (1 + p / 2))
    assert np.isclose(got["MOM_SHAPE_HU_4"][0], smu[4] / smu[2] ** 2)
    assert np.isclose(got["MOM_SHAPE_HU_5"][0], smu[3] ** 2 / smu[2] ** 3)
    # degenerate: all mass at one position → HU4/HU5 soft-NaN (mu2 = 0)
    one = moments_section(Segments([np.array([0, 9, 0])]), FeatureSettings())
    assert np.isnan(one["MOM_HU_4"][0]) and np.isnan(one["MOM_HU_5"][0])


def test_moments_in_registry(spark, sf_dir):
    from nyxus_spark.features import extract_features, resolve_features

    names = resolve_features(["*ALL_MOMENTS*", "*ALL_IH*"])
    assert set(MOMENTS_FEATURES) <= set(names)
    assert set(IH_FEATURES) <= set(names)
