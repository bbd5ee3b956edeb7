"""Gabor filter bank + radial distribution over token streams.

1-D recasts of the reference's remaining feature families:

* GABOR (src/nyx/features/gabor.cpp:18,43-122): nyxus convolves a bank of
  2-D Gabor filters at several frequencies and scores the energized-area ratio
  vs a baseline low-pass filter. 1-D contract: a K=9 complex Gabor kernel per
  frequency f (Gaussian envelope × cos/sin carrier), convolved along the
  sequence; GABOR_E_{f} = mean squared magnitude of the response over valid
  positions divided by the baseline (f=0 Gaussian) energy. Degenerate or
  too-short sequences (< K tokens) emit softNAN.

* RADIAL distribution (src/nyx/features/radial_distribution.cpp —
  FRAC_AT_D/MEAN_FRAC/RADIAL_CV): the pixel-to-centroid radius becomes the
  normalized positional distance |i − c| / max(c, n−1−c) from the weighted
  centroid; token mass is binned into 8 radial bands.

Segment-vectorized: convolution = K shift-masked multiply-adds on the flat
array (arena-backed); radial bands = one bincount.
"""

from __future__ import annotations

import numpy as np

from nyxus_spark.features._arena import buf
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

# 8 bank outputs mirroring the reference's f0_theta_pairs bank size
# (gabor.cpp:19-24 — 4 default pairs, README documents up to 8 values); in
# 1-D there is no θ, so the bank spans 8 carrier frequencies f/16 cycles per
# sample up to Nyquist (f=8)
GABOR_FREQS = (1, 2, 3, 4, 5, 6, 7, 8)
K = 9  # kernel taps
N_BANDS = 8

GABOR_FEATURES = [f"GABOR_E_{f}" for f in GABOR_FREQS]
RADIAL_FEATURES = [f"FRAC_AT_D_{k}" for k in range(N_BANDS)] + ["MEAN_FRAC", "RADIAL_CV"]


def _kernels():
    c = K // 2
    x = np.arange(K, dtype=np.float64) - c
    env = np.exp(-(x ** 2) / (2.0 * 3.0 ** 2))
    base = env / env.sum()
    ks = {}
    for f in GABOR_FREQS:
        phase = 2.0 * np.pi * f * x / 16.0
        kc = env * np.cos(phase)
        ksn = env * np.sin(phase)
        # zero-mean carriers: DC (the token-stream baseline) must not leak
        # into band-pass energies
        ks[f] = (kc - kc.mean(), ksn - ksn.mean())
    return base, ks


def gabor_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n = seg.n_rows
    nan = settings.softnan
    total = seg.flat.size
    out = {name: np.full(n, nan) for name in GABOR_FEATURES}
    if total == 0:
        return out
    x = seg.flat.astype(np.float64)
    c = K // 2
    pos = np.arange(total, dtype=np.int64) - seg.starts[seg.row_idx]
    valid = (pos >= c) & (pos <= seg.lengths[seg.row_idx] - 1 - c)
    vrows = seg.row_idx[valid]
    nvalid = np.bincount(vrows, minlength=n).astype(np.float64)
    base_k, banks = _kernels()

    def conv(weights):
        acc = buf("gab_acc", total)
        acc.fill(0.0)
        t = buf("gab_t", total)
        for k in range(K):
            off = k - c
            w = weights[k]
            m = total - abs(off)
            if m <= 0:
                continue
            if off == 0:
                np.multiply(x, w, out=t)
                np.add(acc, t, out=acc)
            elif off > 0:
                np.multiply(x[off:], w, out=t[:m])
                np.add(acc[:m], t[:m], out=acc[:m])
            else:
                np.multiply(x[:m], w, out=t[:m])
                np.add(acc[-off:], t[:m], out=acc[-off:])
        return acc

    base_resp = conv(base_k)
    base_energy = np.bincount(vrows, weights=(base_resp[valid]) ** 2, minlength=n)
    ok = (nvalid > 0) & (base_energy > 0)
    safe_n = np.where(nvalid > 0, nvalid, 1.0)
    base_mean = base_energy / safe_n
    for f in GABOR_FREQS:
        kc, ksn = banks[f]
        rc = conv(kc).copy()
        rs = conv(ksn)
        mag = buf("gab_mag", total)
        np.multiply(rc, rc, out=mag)
        np.multiply(rs, rs, out=rs)
        np.add(mag, rs, out=mag)
        e = np.bincount(vrows, weights=mag[valid], minlength=n) / safe_n
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = e / np.where(base_mean > 0, base_mean, 1.0)
        out[f"GABOR_E_{f}"] = np.where(ok, ratio, nan)
    return out


def radial_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n = seg.n_rows
    nan = settings.softnan
    w = seg.flat.astype(np.float64)
    out = {name: np.full(n, nan) for name in RADIAL_FEATURES}
    if w.size == 0:
        return out
    pos = (np.arange(w.size, dtype=np.float64) - seg.starts[seg.row_idx])
    m0 = seg.seg_sum(w)
    m1 = seg.seg_sum(w * pos)
    ok = m0 > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        cen = m1 / np.where(ok, m0, 1.0)
        reach = np.maximum(cen, (seg.lengths - 1) - cen)
        reach = np.where(reach > 0, reach, 1.0)
        r = np.abs(pos - cen[seg.row_idx]) / reach[seg.row_idx]
        band = np.clip((r * N_BANDS).astype(np.int64), 0, N_BANDS - 1)
        # weighted per-band token mass
        key = seg.row_idx * N_BANDS + band
        wm = np.bincount(key, weights=w, minlength=n * N_BANDS).reshape(n, N_BANDS)
        frac = wm / np.where(ok, m0, 1.0)[:, None]
        mean_frac = frac.mean(axis=1)
        std_frac = frac.std(axis=1)
        cv = std_frac / np.where(mean_frac > 0, mean_frac, 1.0)
    for k in range(N_BANDS):
        out[f"FRAC_AT_D_{k}"] = np.where(ok, frac[:, k], nan)
    out["MEAN_FRAC"] = np.where(ok, mean_frac, nan)
    out["RADIAL_CV"] = np.where(ok, cv, nan)
    return out
