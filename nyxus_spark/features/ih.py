"""IBSI Intensity-Histogram family (46 IH_* features).

Faithful 1-D port of /root/reference/src/nyx/features/intensity_histogram.cpp:31-310:
single N-bin histogram over the per-sequence [min, max] (bin = floor((v-min)/bw)
clamped to [0, N-1]); value-domain stats use bin centers, index-domain stats use
0-based bin indices (emitted 1-based); quantiles are interpolated within the
stop bin walking from the bottom (p < 0.5) or the top (p >= 0.5); the median is
the CENTER of the bin where the running count first exceeds floor(count/2) —
not an interpolated quantile; gradients are central differences of the
frequency vector with forward/backward edges, extremes seeded from
DBL_MIN/DBL_MAX (intensity_histogram.cpp:162-167).

Divergence from the reference (documented): nyxus computes IH only under the
IBSI setting gate (intensity_histogram.cpp:304-310); this engine computes it
whenever requested. Degenerate sequences (empty or min==max) emit softNAN.
"""

from __future__ import annotations

import numpy as np

from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

_VAL = ["MEAN", "VARIANCE", "SKEWNESS", "EXCESS_KURTOSIS", "MEDIAN", "MINIMUM",
        "P10", "P90", "MAXIMUM", "MODE", "INTERQUANTILE_RANGE", "RANGE",
        "MEAN_ABSOLUTE_DEVIATION", "ROBUST_MEAN_ABSOLUTE_DEVIATION",
        "MEDIAN_ABSOLUTE_DEVIATION", "COEFFICIENT_OF_VARIATION",
        "QUANTILE_COEFFICIENT_OF_DISPERSION", "ENTROPY", "UNIFORMITY", "ROBUST_MEAN"]

IH_FEATURES = (
    [f"IH_{k}_VAL" for k in _VAL]
    + [f"IH_{k}_IDX" for k in _VAL if k not in ("ROBUST_MEAN",)]
    + ["IH_MAX_GRADIENT", "IH_MAX_GRADIENT_IDX", "IH_MIN_GRADIENT",
       "IH_MIN_GRADIENT_IDX", "IH_ROBUST_MEAN_IDX", "IH_NUM_BINS", "IH_BIN_SIZE"]
)

_DBL_MIN = np.finfo(np.float64).tiny
_DBL_MAX = np.finfo(np.float64).max


def _quantile(freq, cum, total, bw, vmin, p):
    """Vectorized transcription of the reference's histogram quantile
    (intensity_histogram.cpp:69-102)."""
    n_rows, N = freq.shape
    rows = np.arange(n_rows)
    if p < 0.5:
        # first bin where cumP >= p
        nstar = (cum / total[:, None] < p).sum(axis=1)
        nstar = np.minimum(nstar, N - 1)
        f_n = freq[rows, nstar]
        p_prev = np.where(nstar > 0, cum[rows, np.maximum(nstar - 1, 0)], 0.0) / total
        binprop = f_n / total
        mn = vmin + nstar * bw
        with np.errstate(divide="ignore", invalid="ignore"):
            return mn + ((p - p_prev) / np.where(binprop > 0, binprop, np.nan)) * bw
    # walk from the top (intensity_histogram.cpp:86-101): the stop bin is the
    # largest PRESENT bin with cum_excl/total <= p — the C++ only ever stops on
    # a bin it just added, so absent bins can never be selected (a pure
    # count-of-cum form can land on an absent bin at exact float equality)
    valid = (freq > 0) & ((cum - freq) / total[:, None] <= p)
    i = np.where(valid, np.arange(N)[None, :], -1).max(axis=1)
    i = np.clip(i, 0, N - 1)
    f_n = freq[rows, i]
    p_prev = cum[rows, i] / total  # p_n before processing stop bin (1 - revcum_{i+1}/tot)
    binprop = f_n / total
    mx = vmin + (i + 1.0) * bw
    with np.errstate(divide="ignore", invalid="ignore"):
        return mx - ((p_prev - p) / np.where(binprop > 0, binprop, np.nan)) * bw


def ih_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n_rows = seg.n_rows
    N = abs(settings.n_bins)
    nan = settings.softnan
    v = seg.flat.astype(np.float64)
    total = seg.lengths.astype(np.float64)
    vmin = np.nan_to_num(seg.seg_min())
    vmax = np.nan_to_num(seg.seg_max())
    rng = vmax - vmin
    ok = (seg.lengths > 0) & (rng > 0)
    bw = np.where(rng > 0, rng / N, 1.0)

    with np.errstate(divide="ignore", invalid="ignore"):
        idx = np.floor((v - vmin[seg.row_idx]) / bw[seg.row_idx]).astype(np.int64)
        np.clip(idx, 0, N - 1, out=idx)
        freq = seg.seg_bincount(idx, N).astype(np.float64)
        cum = np.cumsum(freq, axis=1)
        rows = np.arange(n_rows)
        i_arr = np.arange(N, dtype=np.float64)
        prob = freq / np.where(total > 0, total, 1)[:, None]

        def get_index_of(value):
            ix = np.floor((value - vmin) / bw).astype(np.int64)
            return np.clip(ix, 0, N - 1)

        # median: center of first bin with cumcount > floor(count/2)
        half = np.floor(seg.lengths / 2).astype(np.float64)
        med_bin = (cum <= half[:, None]).sum(axis=1)
        med_bin = np.minimum(med_bin, N - 1)
        median_val = vmin + (med_bin + 0.5) * bw
        median_idx = get_index_of(median_val)

        p10_val = _quantile(freq, cum, total, bw, vmin, 0.10)
        p25_val = _quantile(freq, cum, total, bw, vmin, 0.25)
        p75_val = _quantile(freq, cum, total, bw, vmin, 0.75)
        p90_val = _quantile(freq, cum, total, bw, vmin, 0.90)
        p10_idx = get_index_of(p10_val)
        p25_idx = get_index_of(p25_val)
        p75_idx = get_index_of(p75_val)
        p90_idx = get_index_of(p90_val)
        min_idx = get_index_of(vmin)
        max_idx = get_index_of(vmax)

        # centers are AFFINE in the bin index (center_i = vmin + (i+0.5)·bw),
        # so every value-domain moment is the index-domain moment scaled by
        # bw^k — the dense (n_rows, N) value matrices never materialize and
        # the heavy passes run once, on the index domain.
        # mean/variance/uniformity use the exact-integer-numerator forms
        # (S1 = Σf·i, S2 = Σf·i² are exact ints, so the sums are
        # order-independent and ONE final division is bit-deterministic —
        # what puts the value-domain stats under the driver's oracle gate)
        safe_total = np.where(total > 0, total, 1)
        S1 = (freq * i_arr).sum(axis=1)
        S2 = (freq * i_arr ** 2).sum(axis=1)
        mean_idx = S1 / safe_total
        mean_val = vmin + (mean_idx + 0.5) * bw

        robust_band = (i_arr[None, :] >= p10_idx[:, None]) & (i_arr[None, :] <= p90_idx[:, None])
        bandw = np.where(robust_band, freq, 0.0)
        rcount = bandw.sum(axis=1)
        safe_rc = np.where(rcount > 0, rcount, 1)
        B1 = (bandw * i_arr).sum(axis=1)  # exact int (band Σf·i)
        rmean_idx = B1 / safe_rc
        rmean_val = vmin + (rmean_idx + 0.5) * bw

        di = i_arr[None, :] - mean_idx[:, None]
        di2 = di * di
        var_idx = (safe_total * S2 - S1 ** 2) / safe_total ** 2
        var_val = var_idx * (bw * bw)  # explicit x*x (single rounding, SQL-replayable)
        # the axis-1 sums run over N = 64 bins — BELOW numpy's 128-element
        # pairwise threshold, so they are sequential folds in bin order and
        # replay in SQL as list_reduce(list(term ORDER BY bin)); the
        # denominators are explicit IEEE chains (x·sqrt(x), x·x — never pow)
        skew_idx = (prob * di2 * di).sum(axis=1) / (var_idx * np.sqrt(var_idx))
        skew_val = skew_idx  # scale-invariant (bw³/bw³)
        kurt_idx = (prob * di2 * di2).sum(axis=1) / (var_idx * var_idx) - 3.0
        kurt_val = kurt_idx  # scale-invariant (bw⁴/bw⁴)

        mode_bin = np.argmax(freq, axis=1)  # first max (strict >)
        mode_val = vmin + (mode_bin + 0.5) * bw

        # deviation sums as EXACT-INTEGER numerators + ONE final division
        # (order-independent, SQL-replayable — the CLAUDE.md rational trick):
        # mad  = Σf·|i − S1/N| /N  = Σf·|N·i − S1| / N²        (all ints)
        # rmad = Σ_band f·|i − B1/R| /R = Σ_band f·|R·i − B1| / R²
        # medad= Σf·|i − med| /N   (med is an integer bin)
        # terms stay < 2⁵³: f·N·63 ≤ 63·len² ≤ 2.5e8 per bin at len 2000
        mad_idx = (freq * np.abs(safe_total[:, None] * i_arr[None, :]
                                 - S1[:, None])).sum(axis=1) / safe_total ** 2
        mad_val = mad_idx * bw
        rmad_idx = (bandw * np.abs(safe_rc[:, None] * i_arr[None, :]
                                   - B1[:, None])).sum(axis=1) / safe_rc ** 2
        rmad_val = rmad_idx * bw
        medad_idx = (freq * np.abs(i_arr[None, :]
                                   - median_idx[:, None].astype(np.float64))
                     ).sum(axis=1) / safe_total
        # median_val sits at the CENTER of bin med_bin == median_idx, so the
        # value-domain deviation is exactly bw·|i − median_idx|
        medad_val = medad_idx * bw

        pe = np.where(prob > 1e-7, prob, 1.0)
        entropy = -(np.where(prob > 1e-7, prob * np.log(pe) / np.log(2.0), 0.0)).sum(axis=1)
        uniformity = (freq ** 2).sum(axis=1) / safe_total ** 2

        cov_val = np.sqrt(var_val) / mean_val
        cov_idx = np.sqrt(var_idx) / (mean_idx + 1.0)
        qcod_val = (p75_val - p25_val) / (p75_val + p25_val)
        qcod_idx = (p75_idx - p25_idx) / (p75_idx + 1.0 + p25_idx + 1.0)

        # gradients (central differences, forward/backward at edges)
        grad = np.empty_like(freq)
        if N >= 2:
            grad[:, 0] = freq[:, 1] - freq[:, 0]
            grad[:, -1] = freq[:, -1] - freq[:, -2]
            if N > 2:
                grad[:, 1:-1] = (freq[:, 2:] - freq[:, :-2]) / 2.0
        else:
            grad[:] = 0.0
        # extremes seeded from DBL_MIN/DBL_MAX with strict compare
        # (intensity_histogram.cpp:162-167): if no gradient exceeds the tiny
        # positive seed, the value stays at the seed and the index at 0.
        gmax_has = grad.max(axis=1) > _DBL_MIN
        gmax = np.where(gmax_has, grad.max(axis=1), _DBL_MIN)
        gmax_idx = np.where(gmax_has, np.argmax(grad, axis=1) + 1.0, 0.0)
        gmin = grad.min(axis=1)
        gmin_idx = np.argmin(grad, axis=1) + 1.0

    vals = {
        "IH_MEAN_VAL": mean_val, "IH_VARIANCE_VAL": var_val, "IH_SKEWNESS_VAL": skew_val,
        "IH_EXCESS_KURTOSIS_VAL": kurt_val, "IH_MEDIAN_VAL": median_val,
        "IH_MINIMUM_VAL": vmin, "IH_P10_VAL": p10_val, "IH_P90_VAL": p90_val,
        "IH_MAXIMUM_VAL": vmax, "IH_MODE_VAL": mode_val,
        "IH_INTERQUANTILE_RANGE_VAL": p75_val - p25_val, "IH_RANGE_VAL": vmax - vmin,
        "IH_MEAN_ABSOLUTE_DEVIATION_VAL": mad_val,
        "IH_ROBUST_MEAN_ABSOLUTE_DEVIATION_VAL": rmad_val,
        "IH_MEDIAN_ABSOLUTE_DEVIATION_VAL": medad_val,
        "IH_COEFFICIENT_OF_VARIATION_VAL": cov_val,
        "IH_QUANTILE_COEFFICIENT_OF_DISPERSION_VAL": qcod_val,
        "IH_ENTROPY_VAL": entropy, "IH_UNIFORMITY_VAL": uniformity,
        "IH_ROBUST_MEAN_VAL": rmean_val,
        "IH_MEAN_IDX": mean_idx + 1.0, "IH_VARIANCE_IDX": var_idx,
        "IH_SKEWNESS_IDX": skew_idx, "IH_EXCESS_KURTOSIS_IDX": kurt_idx,
        "IH_MEDIAN_IDX": median_idx + 1.0, "IH_MINIMUM_IDX": min_idx + 1.0,
        "IH_P10_IDX": p10_idx + 1.0, "IH_P90_IDX": p90_idx + 1.0,
        "IH_MAXIMUM_IDX": max_idx + 1.0, "IH_MODE_IDX": mode_bin + 1.0,
        "IH_INTERQUANTILE_RANGE_IDX": (p75_idx - p25_idx).astype(np.float64),
        "IH_RANGE_IDX": (max_idx - min_idx).astype(np.float64),
        "IH_MEAN_ABSOLUTE_DEVIATION_IDX": mad_idx,
        "IH_ROBUST_MEAN_ABSOLUTE_DEVIATION_IDX": rmad_idx,
        "IH_MEDIAN_ABSOLUTE_DEVIATION_IDX": medad_idx,
        "IH_COEFFICIENT_OF_VARIATION_IDX": cov_idx,
        "IH_QUANTILE_COEFFICIENT_OF_DISPERSION_IDX": qcod_idx,
        "IH_ENTROPY_IDX": entropy, "IH_UNIFORMITY_IDX": uniformity,
        "IH_MAX_GRADIENT": gmax, "IH_MAX_GRADIENT_IDX": gmax_idx,
        "IH_MIN_GRADIENT": gmin, "IH_MIN_GRADIENT_IDX": gmin_idx,
        "IH_ROBUST_MEAN_IDX": rmean_idx,
        "IH_NUM_BINS": np.full(n_rows, float(N)), "IH_BIN_SIZE": bw,
    }
    return {k: np.where(ok, x, nan) for k, x in vals.items()}
