"""First-order statistics over token streams (nyxus "pixel intensity" family).

Faithful 1-D recast of /root/reference/src/nyx/features/intensity.cpp:57-224
with the TrivialHistogram semantics of src/nyx/features/histogram.h:17-399:

* blank sequence (min == max): MEAN=MEDIAN=MIN=MAX=min, RANGE=0, everything
  else = softNAN (intensity.cpp:60-96);
* percentiles are interpolated over a 100-bin histogram — *not* numpy/Spark
  percentile semantics: bin width = range/100, index = int((v-min)/binW), the
  overflow bin folds into bin 99, and pX solves the last bin i with
  runSum_{i-1} <= pop*X <= runSum_i via
  pX = (pop*X - runSum_{i-1}) * binW / count_i + min + binW*i
  (histogram.h:298-327);
* ENTROPY/UNIFORMITY use the N-bin "custom" histogram with
  bin = int((v-min)/range*N) and last-bin fold (helpers.h to_grayscale,
  histogram.h:64-74,229-236); entropy = -Σ p*log2(p + 2.2e-16);
* MEDIAN over raw sorted values, even count → (left+right)/2
  (histogram.h:352-371); MODE = smallest value of highest frequency
  (histogram.h:373-393, std::map ordering);
* RMAD over values in [P10, P90] (histogram.h:86-108); ROBUST_MEAN likewise
  (intensity.cpp:171-181);
* SKEWNESS = sqrt(n)*M3/M2^1.5 (n>3), KURTOSIS = n*M4/M2² (n>4),
  EXCESS_KURTOSIS = KURTOSIS-3 (moments.h:82-109, M_k = Σ(x-mean)^k);
* HYPERSKEWNESS = Σd⁵/(n·std⁵), HYPERFLATNESS = Σd⁶/(n·std⁶) with sample std
  (intensity.cpp:209-223).

All computation is segment-vectorized (no per-row Python).
"""

from __future__ import annotations

import numpy as np

from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

FIRSTORDER_FEATURES = [
    "COUNT",
    "MIN", "MAX", "RANGE", "MEAN", "MEDIAN", "MODE",
    "ENERGY", "ROOT_MEAN_SQUARED", "INTEGRATED_INTENSITY",
    "MEAN_ABSOLUTE_DEVIATION", "MEDIAN_ABSOLUTE_DEVIATION",
    "VARIANCE", "VARIANCE_BIASED",
    "STANDARD_DEVIATION", "STANDARD_DEVIATION_BIASED", "STANDARD_ERROR",
    "COV", "SKEWNESS", "KURTOSIS", "EXCESS_KURTOSIS",
    "HYPERSKEWNESS", "HYPERFLATNESS",
    "ENTROPY", "UNIFORMITY", "UNIFORMITY_PIU",
    "P01", "P10", "P25", "P75", "P90", "P99",
    "INTERQUARTILE_RANGE", "QCOD",
    "ROBUST_MEAN", "ROBUST_MEAN_ABSOLUTE_DEVIATION",
]

_PCT = {"P01": 0.01, "P10": 0.1, "P25": 0.25, "P75": 0.75, "P90": 0.9, "P99": 0.99}

# per-bin histogram output columns (one feature per custom-histogram bin,
# /root/reference/src/nyx/features/intensity.cpp:399-402); own section so the
# default *ALL* catalog keeps its column count — opt in by name or *ALL_HISTO*
N_HISTO_BINS = 64
HISTO_FEATURES = [f"HISTO_BIN_{i}" for i in range(N_HISTO_BINS)]


def histo_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    """Exact per-bin counts of the N-bin custom histogram (same bin rule as
    ENTROPY/UNIFORMITY: bin = int((v−min)/range·N), last-bin fold,
    helpers.h:337-345 / histogram.h:64-74). Degenerate rows → softNAN."""
    nb = abs(settings.n_bins)
    if nb != N_HISTO_BINS:
        raise ValueError(
            f"HISTO_BIN_* features require the default n_bins={N_HISTO_BINS} "
            f"(registered column names are fixed); got n_bins={settings.n_bins}"
        )
    v = seg.flat.astype(np.float64)
    vmin = seg.seg_min()
    vmax = seg.seg_max()
    rng = vmax - vmin
    ok = (seg.lengths > 0) & (rng > 0)
    safe_rng = np.where(rng > 0, rng, 1.0)
    if v.size:
        cust_idx = ((v - np.nan_to_num(vmin)[seg.row_idx])
                    / safe_rng[seg.row_idx] * nb).astype(np.int64)
        np.clip(cust_idx, 0, nb, out=cust_idx)
        cbins = seg.seg_bincount(cust_idx, nb + 1)
        cbins[:, nb - 1] += cbins[:, nb]
        cbins = cbins[:, :nb].astype(np.float64)
    else:
        cbins = np.zeros((seg.n_rows, nb))
    return {
        f"HISTO_BIN_{i}": np.where(ok, cbins[:, i], settings.softnan)
        for i in range(nb)
    }


def _percentiles_100bin(seg: Segments, vmin: np.ndarray, rng: np.ndarray, pop: np.ndarray):
    """Interpolated percentiles over the nyxus 100-bin histogram (vectorized)."""
    v = seg.flat.astype(np.float64)
    safe_rng = np.where(rng > 0, rng, 1.0)
    binw = safe_rng / 100.0
    real_idx = (v - vmin[seg.row_idx]) / binw[seg.row_idx]
    idx = real_idx.astype(np.int64)
    np.clip(idx, 0, 100, out=idx)
    bins = seg.seg_bincount(idx, 101)
    bins[:, 99] += bins[:, 100]
    bins = bins[:, :100]
    R = np.cumsum(bins, axis=1)  # R[:, i] = runSum after bin i
    out = {}
    rows = np.arange(seg.n_rows)
    for name, q in _PCT.items():
        cnt = pop * q
        # last bin i with runSum_{i-1} <= cnt <= runSum_i  (histogram.h:309-326)
        istar = (R[:, :99] <= cnt[:, None]).sum(axis=1)
        c = bins[rows, istar].astype(np.float64)
        r_prev = np.where(istar > 0, R[rows, np.maximum(istar - 1, 0)], 0).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = (cnt - r_prev) * binw / np.where(c > 0, c, 1.0) + vmin + binw * istar
        out[name] = p
    return out


def firstorder_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n_rows = seg.n_rows
    nan = settings.softnan
    v = seg.flat.astype(np.float64)
    pop = seg.lengths.astype(np.float64)
    nonempty = seg.lengths > 0

    vmin = seg.seg_min()
    vmax = seg.seg_max()
    rng = vmax - vmin
    blank = nonempty & (rng == 0)  # intensity.cpp:60 blank-ROI intercept
    ok = nonempty & (rng > 0)

    with np.errstate(divide="ignore", invalid="ignore"):
        s1 = seg.seg_sum(v)
        mean = s1 / pop
        energy = seg.seg_sum(v * v)
        rms = np.sqrt(energy / pop)
        d = v - mean[seg.row_idx]
        ad = np.abs(d)
        mad = seg.seg_sum(ad) / pop
        d2 = d * d
        ss = seg.seg_sum(d2)
        var = np.where(pop > 1, ss / np.maximum(pop - 1, 1), 0.0)
        var_b = np.where(pop > 1, ss / pop, 0.0)
        std = np.sqrt(var)
        std_b = np.sqrt(var_b)
        cov = std / mean
        stderr = std / np.sqrt(pop)

        # moments.h:82-109 semantics with M_k = Σ d^k. Powers via an explicit
        # multiply chain (d³=d²·d, d⁴=d²·d², d⁵=d⁴·d, d⁶=d³·d³): np.power
        # with integer exponents ≥ 5 drops to the ~20×-slower pow loop.
        d3 = d2 * d
        d4 = d2 * d2
        m3 = seg.seg_sum(d3)
        m4 = seg.seg_sum(d4)
        # x^1.5 / x^5 / x^6 as explicit IEEE sqrt+multiply chains (not libm
        # pow): every op is correctly rounded, so a SQL oracle that replays
        # the same tree gets the identical double — this is what moves
        # SKEW/HYPER* under the driver gate (and the chains are faster than
        # the pow loop anyway).
        ss_safe = np.where(ss > 0, ss, 1)
        skew = np.where((pop > 3) & (ss > 0), np.sqrt(pop) * m3 / (ss_safe * np.sqrt(ss_safe)), 0.0)
        kurt = np.where((pop > 4) & (ss > 0), pop * m4 / np.square(ss_safe), 0.0)
        exkurt = np.where((pop > 4) & (ss > 0), kurt - 3.0, 0.0)
        s5 = seg.seg_sum(d4 * d)
        s6 = seg.seg_sum(d3 * d3)
        std2 = std * std
        den5 = pop * ((std2 * std2) * std)
        den6 = pop * ((std2 * std2) * std2)
        hskew = np.where(den5 != 0, s5 / np.where(den5 != 0, den5, 1), 0.0)
        hflat = np.where(den6 != 0, s6 / np.where(den6 != 0, den6, 1), 0.0)

        # ---- TrivialHistogram block (histogram.h) --------------------------
        pcts = _percentiles_100bin(seg, vmin, rng, pop)
        p10, p25, p75, p90 = pcts["P10"], pcts["P25"], pcts["P75"], pcts["P90"]
        iqr = p75 - p25
        qcod = (p75 - p25) / (p75 + p25)

        # custom N-bin histogram → entropy / uniformity (histogram.h:64-74,229-236)
        nb = abs(settings.n_bins)
        safe_rng = np.where(rng > 0, rng, 1.0)
        cust_idx = ((v - vmin[seg.row_idx]) / safe_rng[seg.row_idx] * nb).astype(np.int64)
        np.clip(cust_idx, 0, nb, out=cust_idx)
        cbins = seg.seg_bincount(cust_idx, nb + 1)
        cbins[:, nb - 1] += cbins[:, nb]
        cbins = cbins[:, :nb]
        p = cbins / np.where(pop > 0, pop, 1)[:, None]
        entropy = -(p * np.log2(p + 2.2e-16)).sum(axis=1)
        # integer numerator + one division: bit-deterministic (see texture.py)
        uniformity = (cbins.astype(np.float64) ** 2).sum(axis=1) / np.where(pop > 0, pop, 1) ** 2

        # median over raw sorted values (histogram.h:352-371)
        sf = seg.sorted_within()
        half = seg.lengths // 2
        mid_hi = np.minimum(seg.starts + half, np.maximum(seg.starts + seg.lengths - 1, seg.starts))
        mid_lo = np.maximum(mid_hi - 1, seg.starts)
        odd = seg.lengths % 2 != 0
        median = np.where(
            odd,
            sf[np.minimum(mid_hi, max(sf.size - 1, 0))] if sf.size else 0.0,
            (sf[np.minimum(mid_lo, max(sf.size - 1, 0))] + sf[np.minimum(mid_hi, max(sf.size - 1, 0))]) / 2.0
            if sf.size
            else 0.0,
        ).astype(np.float64)

        # mode: smallest value with the highest frequency (histogram.h:373-393)
        r_rows, r_vals, r_cnts = seg.value_runs(sf)
        mode = np.zeros(n_rows)
        if r_rows.size:
            order = np.lexsort((r_vals, -r_cnts, r_rows))
            first = np.searchsorted(r_rows[order], np.arange(n_rows), side="left")
            has = first < r_rows.size
            safe_first = np.minimum(first, r_rows.size - 1)
            valid = has & (r_rows[order][safe_first] == np.arange(n_rows))
            mode[valid] = r_vals[order][safe_first[valid]]

        # robust band [P10, P90] (histogram.h:86-108, intensity.cpp:171-181)
        band = (v >= p10[seg.row_idx]) & (v <= p90[seg.row_idx])
        cnt_band = seg.seg_count(band).astype(np.float64)
        sum_band = seg.seg_sum_where(v, band)
        robust_mean = np.where(cnt_band > 0, sum_band / np.where(cnt_band > 0, cnt_band, 1), 0.0)
        rmad = np.where(
            cnt_band > 0,
            seg.seg_sum_where(np.abs(v - robust_mean[seg.row_idx]), band)
            / np.where(cnt_band > 0, cnt_band, 1),
            0.0,
        )

        medad = seg.seg_sum(np.abs(v - median[seg.row_idx])) / pop
        piu = (1.0 - rng / (vmax + vmin)) * 100.0

    def fin(x, blank_val=nan):
        """Apply blank/empty-row NaN paths (intensity.cpp:60-96)."""
        out = np.asarray(x, dtype=np.float64).copy()
        out[blank] = blank_val if np.isscalar(blank_val) else blank_val[blank]
        out[~nonempty] = nan
        return out

    res = {
        "COUNT": np.where(nonempty, pop, 0.0),
        "MIN": fin(vmin, vmin), "MAX": fin(vmax, vmax),
        "RANGE": fin(rng, 0.0),
        "MEAN": fin(mean, vmin), "MEDIAN": fin(median, vmin),
        "MODE": fin(mode), "ENERGY": fin(energy),
        "ROOT_MEAN_SQUARED": fin(rms), "INTEGRATED_INTENSITY": fin(s1),
        "MEAN_ABSOLUTE_DEVIATION": fin(mad), "MEDIAN_ABSOLUTE_DEVIATION": fin(medad),
        "VARIANCE": fin(var), "VARIANCE_BIASED": fin(var_b),
        "STANDARD_DEVIATION": fin(std), "STANDARD_DEVIATION_BIASED": fin(std_b),
        "STANDARD_ERROR": fin(stderr), "COV": fin(cov),
        "SKEWNESS": fin(skew), "KURTOSIS": fin(kurt), "EXCESS_KURTOSIS": fin(exkurt),
        "HYPERSKEWNESS": fin(hskew), "HYPERFLATNESS": fin(hflat),
        "ENTROPY": fin(entropy), "UNIFORMITY": fin(uniformity), "UNIFORMITY_PIU": fin(piu),
        "P01": fin(pcts["P01"]), "P10": fin(p10), "P25": fin(p25),
        "P75": fin(p75), "P90": fin(p90), "P99": fin(pcts["P99"]),
        "INTERQUARTILE_RANGE": fin(iqr), "QCOD": fin(qcod),
        "ROBUST_MEAN": fin(robust_mean), "ROBUST_MEAN_ABSOLUTE_DEVIATION": fin(rmad),
    }
    return res
