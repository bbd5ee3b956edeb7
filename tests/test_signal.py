"""Gabor-1D + radial distribution: scalar oracles and invariants."""

import math

import numpy as np
import pytest

from nyxus_spark.features.segmented import Segments
from nyxus_spark.features.signal import (
    GABOR_FEATURES, GABOR_FREQS, K, N_BANDS, RADIAL_FEATURES,
    _kernels, gabor_section, radial_section,
)
from nyxus_spark.settings import FeatureSettings

SET = FeatureSettings()


def gabor_ref(values):
    """Scalar convolution reference."""
    n = len(values)
    c = K // 2
    if n < K:
        return None
    base_k, banks = _kernels()
    valid = range(c, n - c)

    def conv_at(w, i):
        return sum(w[k] * values[i + k - c] for k in range(K))

    base_e = sum(conv_at(base_k, i) ** 2 for i in valid) / len(valid)
    out = {}
    for f in GABOR_FREQS:
        kc, ks = banks[f]
        e = sum(conv_at(kc, i) ** 2 + conv_at(ks, i) ** 2 for i in valid) / len(valid)
        out[f"GABOR_E_{f}"] = e / base_e if base_e > 0 else math.nan
    return out


def radial_ref(values):
    n = len(values)
    m0 = sum(values)
    if m0 <= 0:
        return None
    c = sum(i * v for i, v in enumerate(values)) / m0
    reach = max(c, (n - 1) - c) or 1.0
    fr = [0.0] * N_BANDS
    for i, v in enumerate(values):
        b = min(int(abs(i - c) / reach * N_BANDS), N_BANDS - 1)
        fr[b] += v / m0
    mean = sum(fr) / N_BANDS
    std = math.sqrt(sum((x - mean) ** 2 for x in fr) / N_BANDS)
    return fr, mean, std / mean if mean > 0 else 0.0


CASES = [
    list(np.random.RandomState(1).randint(0, 251, size=80)),
    list(np.random.RandomState(2).randint(1, 50, size=33)),
    [5] * 20,
    [7],               # shorter than kernel → NaN for gabor
    [0, 0, 10, 0, 0],
    list(range(100)),
]


def test_gabor_vs_scalar():
    got = gabor_section(Segments([np.array(c) for c in CASES]), SET)
    for i, c in enumerate(CASES):
        exp = gabor_ref(c)
        if exp is None:
            for f in GABOR_FEATURES:
                assert math.isnan(got[f][i])
            continue
        for f, e in exp.items():
            assert np.isclose(got[f][i], e, rtol=1e-9), (f, i)


def test_gabor_frequency_sensitivity():
    # a pure oscillation at f=4 (period 4 over the 16-sample carrier scale)
    sig = [100 + 80 * int(np.cos(2 * np.pi * 4 * i / 16) > 0) for i in range(200)]
    got = gabor_section(Segments([np.array(sig)]), SET)
    assert got["GABOR_E_4"][0] > got["GABOR_E_1"][0]


def test_radial_vs_scalar():
    got = radial_section(Segments([np.array(c) for c in CASES]), SET)
    for i, c in enumerate(CASES):
        exp = radial_ref(c)
        if exp is None:
            assert math.isnan(got["MEAN_FRAC"][i])
            continue
        fr, mean, cv = exp
        for k in range(N_BANDS):
            assert np.isclose(got[f"FRAC_AT_D_{k}"][i], fr[k], atol=1e-12), (k, i)
        assert np.isclose(got["MEAN_FRAC"][i], mean)
        assert np.isclose(got["RADIAL_CV"][i], cv)
        assert np.isclose(sum(fr), 1.0)


def test_registered_in_catalog():
    from nyxus_spark.features import resolve_features

    names = resolve_features(["*ALL*"])
    assert set(GABOR_FEATURES) <= set(names)
    assert set(RADIAL_FEATURES) <= set(names)
