"""Brute-force oracles for round-2 texture additions:

* GLDZM all-18 codes (featureset.h:271-288, formulas gldzm.cpp:383-478 recast
  over 1-D runs with border distance d = min(start, n-1-end)+1);
* multi-offset GLRLM (stride-d runs over interleaved subsequences) and
  multi-offset GLCM (pairs (i, i+d)) with their _AVE columns;
* GLCM_HOM2 ≡ Σ p/(1+Δ²) (glcm.cpp:1057-1071).

The oracle here is a per-row pure-Python reimplementation — loops and dicts,
no shared code path with the segment-vectorized kernels.
"""

import numpy as np
import pytest

from nyxus_spark.features import texture as tx
from nyxus_spark.features.binning import bin_tokens
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

ST = FeatureSettings()


def _bin_row(row):
    a = np.asarray(row, dtype=np.int64)
    vmin, vmax = float(a.min()), float(a.max())
    return bin_tokens(a, np.full(a.size, vmin), np.full(a.size, vmax), ST.grey_info)


def _runs_of(seq):
    """(level, length, start, end) runs of a 1-D int sequence (zeros break)."""
    runs, i = [], 0
    seq = list(seq)
    while i < len(seq):
        if seq[i] == 0:
            i += 1
            continue
        j = i
        while j + 1 < len(seq) and seq[j + 1] == seq[i]:
            j += 1
        runs.append((seq[i], j - i + 1, i, j))
        i = j + 1
    return runs


def _rows(seed=7, n=40):
    rng = np.random.default_rng(seed)
    rows = [rng.integers(1, 9, size=rng.integers(6, 30)).tolist() for _ in range(n)]
    rows.append([3, 3, 3, 5, 5, 3, 3, 7])
    return rows


def test_gldzm_all_18_vs_bruteforce():
    rows = _rows()
    seg = Segments(rows)
    out = tx.glrlm_section(seg, ST)
    for r, row in enumerate(rows):
        binned = _bin_row(row)
        runs = _runs_of(binned)
        n = len(row)
        # zone distance of a run = min(start, (n-1)-end) + 1
        zones = [(g, min(s, (n - 1) - e) + 1) for g, L, s, e in runs]
        Ns = len(zones)
        Np = int((binned != 0).sum())
        if Ns == 0 or np.all(binned == binned[0]):
            continue
        gs = np.array([z[0] for z in zones], dtype=float)
        ds = np.array([z[1] for z in zones], dtype=float)
        from collections import Counter
        mg = Counter(z[0] for z in zones)
        md = Counter(z[1] for z in zones)
        cells = Counter(zones)
        p = np.array(list(cells.values()), dtype=float) / Ns
        exp = {
            "GLDZM_SDE": float(np.sum(1 / ds**2)) / Ns,
            "GLDZM_LDE": float(np.sum(ds**2)) / Ns,
            "GLDZM_LGLZE": float(np.sum(1 / gs**2)) / Ns,
            "GLDZM_HGLZE": float(np.sum(gs**2)) / Ns,
            "GLDZM_SDLGLE": float(np.sum(1 / (gs**2 * ds**2))) / Ns,
            "GLDZM_SDHGLE": float(np.sum(gs**2 / ds**2)) / Ns,
            "GLDZM_LDLGLE": float(np.sum(ds**2 / gs**2)) / Ns,
            "GLDZM_LDHGLE": float(np.sum(gs**2 * ds**2)) / Ns,
            "GLDZM_GLNU": sum(c * c for c in mg.values()) / Ns,
            "GLDZM_GLNUN": sum(c * c for c in mg.values()) / Ns**2,
            "GLDZM_ZDNU": sum(c * c for c in md.values()) / Ns,
            "GLDZM_ZDNUN": sum(c * c for c in md.values()) / Ns**2,
            "GLDZM_ZP": Ns / Np,
            "GLDZM_GLM": float(gs.mean()),
            "GLDZM_GLV": float(((gs - gs.mean()) ** 2).mean()),
            "GLDZM_ZDM": float(ds.mean()),
            "GLDZM_ZDV": float(((ds - ds.mean()) ** 2).mean()),
            "GLDZM_ZDE": float(-(p * np.log2(p + tx.EPS)).sum()),
        }
        for k, v in exp.items():
            assert out[k][r] == pytest.approx(v, rel=1e-9), (k, r)


def test_glrlm_strided_vs_bruteforce():
    rows = _rows(seed=11)
    seg = Segments(rows)
    out = tx.glrlm_multi_section(seg, ST)
    for r, row in enumerate(rows):
        binned = _bin_row(row)
        if np.all(np.asarray(row) == row[0]):
            continue
        Np = int((binned != 0).sum())
        per = {}
        for d in tx.MULTI_OFFSETS:
            runs = []
            for ph in range(d):
                runs.extend(_runs_of(binned[ph::d]))
            ls = np.array([L for _, L, _, _ in runs], dtype=float)
            Nr = len(runs)
            per[d] = {
                "GLRLM_LRE": float(np.sum(ls**2)) / Nr,
                "GLRLM_SRE": float(np.sum(1 / ls**2)) / Nr,
                "GLRLM_RP": Nr / Np,
            }
            for k, v in per[d].items():
                assert out[f"{k}_D{d}"][r] == pytest.approx(v, rel=1e-9), (k, d, r)
        for k in ("GLRLM_LRE", "GLRLM_SRE", "GLRLM_RP"):
            ave = sum(per[d][k] for d in tx.MULTI_OFFSETS) / len(tx.MULTI_OFFSETS)
            assert out[f"{k}_AVE"][r] == pytest.approx(ave, rel=1e-9), (k, r)


def test_glcm_multi_vs_bruteforce():
    rows = _rows(seed=13)
    seg = Segments(rows)
    out = tx.glcm_multi_section(seg, ST)
    base = tx.glcm_section(seg, ST)
    assert np.allclose(base["GLCM_HOM2"], base["GLCM_IDM"], equal_nan=True)
    for r, row in enumerate(rows):
        binned = _bin_row(row)
        raw = np.asarray(row)
        if np.all(raw == raw[0]):
            continue
        for d in tx.MULTI_OFFSETS:
            pairs = [
                (int(binned[i]), int(binned[i + d]))
                for i in range(len(row) - d)
                if raw[i] != 0 and raw[i + d] != 0
            ]
            if not pairs:
                assert np.isnan(out[f"GLCM_CONTRAST_D{d}"][r])
                continue
            s = len(pairs)
            contrast = sum((a - b) ** 2 for a, b in pairs) / s
            dis = sum(abs(a - b) for a, b in pairs) / s
            from collections import Counter
            cells = Counter(pairs)
            asm = sum(c * c for c in cells.values()) / s**2
            hom2 = sum(c / (1 + (a - b) ** 2) for (a, b), c in cells.items()) / s
            assert out[f"GLCM_CONTRAST_D{d}"][r] == pytest.approx(contrast, rel=1e-9)
            assert out[f"GLCM_DIS_D{d}"][r] == pytest.approx(dis, rel=1e-9)
            assert out[f"GLCM_ASM_D{d}"][r] == pytest.approx(asm, rel=1e-9)
            assert out[f"GLCM_HOM2_D{d}"][r] == pytest.approx(hom2, rel=1e-9)
