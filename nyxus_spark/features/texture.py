"""Texture-style feature kernels over 1-D token streams.

1-D recast of the reference's texture families (SURVEY.md §2 A7-A10), with the
sequence position playing the role of the raster axis:

* GLRLM — runs of equal grey (binned) tokens along the sequence
  (/root/reference/src/nyx/features/glrlm.cpp; 1 direction instead of 4)
* GLSZM — zones ≡ runs in 1-D (glszm.cpp DFS clusters degenerate to runs)
* GLDZM — zone distance = distance of a run to the nearer sequence border
  (gldzm.cpp:244-256 analog)
* GLDM  — dependence size = 1 + #neighbors within ±offset equal to the center
  (gldm.cpp:174, ngldm.cpp:74-111 analog)
* NGTDM — s_i = |g_i − mean(nonzero neighbors within ±offset)| accumulated per
  grey level (ngtdm.cpp:80-200)
* GLCM  — co-occurrence of (binned[i], binned[i+offset]) pairs
  (glcm.cpp:380-487), background pairs skipped on the ORIGINAL intensity
  (glcm.cpp:445-446), symmetric accumulation for radiomics/IBSI binning
  (glcm.cpp:475-477), entropies log2 with +eps (glcm.cpp:715-830).

Grey binning follows texture_feature.h exactly (see binning.py). Feature
formulas are the IBSI/standard definitions the reference implements; values
are grey-level VALUES (not indices), matching nyxus's use of the sorted
unique-intensity vector I in all three binning modes.

Degenerate sequences (constant, empty, all-background): GLCM/GLDM/NGTDM emit
softNAN (glcm.cpp:27-95, ngtdm "binned data uninformative" path); GLRLM-family
emits 0 (glrlm.cpp osized degenerate path).

Everything is segment-vectorized; per-row dense matrices are materialized in
bounded row-chunks so memory stays ~O(chunk·levels²).
"""

from __future__ import annotations

import numpy as np

from nyxus_spark.features._arena import arange_buf, buf
from nyxus_spark.features.binning import bin_tokens
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

EPS = 2.2e-16

GLRLM_NAMES = [
    "GLRLM_SRE", "GLRLM_LRE", "GLRLM_GLN", "GLRLM_GLNN", "GLRLM_RLN", "GLRLM_RLNN",
    "GLRLM_RP", "GLRLM_GLV", "GLRLM_RV", "GLRLM_RE", "GLRLM_LGLRE", "GLRLM_HGLRE",
    "GLRLM_SRLGLE", "GLRLM_SRHGLE", "GLRLM_LRLGLE", "GLRLM_LRHGLE",
]
GLSZM_NAMES = [
    "GLSZM_SAE", "GLSZM_LAE", "GLSZM_GLN", "GLSZM_GLNN", "GLSZM_SZN", "GLSZM_SZNN",
    "GLSZM_ZP", "GLSZM_GLV", "GLSZM_ZV", "GLSZM_ZE", "GLSZM_LGLZE", "GLSZM_HGLZE",
    "GLSZM_SALGLE", "GLSZM_SAHGLE", "GLSZM_LALGLE", "GLSZM_LAHGLE",
]
GLDZM_NAMES = [  # all 18 codes (featureset.h:271-288, formulas gldzm.cpp:383-478)
    "GLDZM_SDE", "GLDZM_LDE", "GLDZM_LGLZE", "GLDZM_HGLZE",
    "GLDZM_SDLGLE", "GLDZM_SDHGLE", "GLDZM_LDLGLE", "GLDZM_LDHGLE",
    "GLDZM_GLNU", "GLDZM_GLNUN", "GLDZM_ZDNU", "GLDZM_ZDNUN",
    "GLDZM_ZP", "GLDZM_GLM", "GLDZM_GLV", "GLDZM_ZDM", "GLDZM_ZDV",
    "GLDZM_ZDE",
]
GLDM_NAMES = [
    "GLDM_SDE", "GLDM_LDE", "GLDM_GLN", "GLDM_DN", "GLDM_DNN", "GLDM_GLV",
    "GLDM_DV", "GLDM_DE", "GLDM_LGLE", "GLDM_HGLE", "GLDM_SDLGLE", "GLDM_SDHGLE",
    "GLDM_LDLGLE", "GLDM_LDHGLE",
]
NGTDM_NAMES = ["NGTDM_COARSENESS", "NGTDM_CONTRAST", "NGTDM_BUSYNESS",
               "NGTDM_COMPLEXITY", "NGTDM_STRENGTH"]
NGLDM_NAMES = [
    "NGLDM_LDE", "NGLDM_HDE", "NGLDM_LGLCE", "NGLDM_HGLCE", "NGLDM_LDLGLE",
    "NGLDM_LDHGLE", "NGLDM_HDLGLE", "NGLDM_HDHGLE", "NGLDM_GLNU", "NGLDM_GLNUN",
    "NGLDM_DCNU", "NGLDM_DCNUN", "NGLDM_GLM", "NGLDM_GLV", "NGLDM_DCM",
    "NGLDM_DCP", "NGLDM_DCV", "NGLDM_DCENT", "NGLDM_DCENE",
]
GLCM_NAMES = [
    "GLCM_ASM", "GLCM_ACOR", "GLCM_CLUPROM", "GLCM_CLUSHADE", "GLCM_CLUTEND",
    "GLCM_CONTRAST", "GLCM_CORRELATION", "GLCM_DIFAVE", "GLCM_DIFENTRO",
    "GLCM_DIFVAR", "GLCM_DIS", "GLCM_ENERGY", "GLCM_ENTROPY", "GLCM_HOM1",
    "GLCM_HOM2", "GLCM_ID", "GLCM_IDN", "GLCM_IDM", "GLCM_IDMN", "GLCM_INFOMEAS1",
    "GLCM_INFOMEAS2", "GLCM_IV", "GLCM_JAVE", "GLCM_JE", "GLCM_JMAX",
    "GLCM_JVAR", "GLCM_SUMAVERAGE", "GLCM_SUMENTROPY", "GLCM_SUMVARIANCE",
    "GLCM_VARIANCE",
]


# --------------------------------------------------------------------------
# shared prep (cached per Segments instance)
# --------------------------------------------------------------------------

def _prep(seg: Segments, settings: FeatureSettings):
    cache = getattr(seg, "_tex_cache", None)
    if cache is not None and cache[0] == settings.grey_info:
        return cache[1]
    raw = seg.flat
    vmin = seg.seg_min(fill=0.0)
    vmax = seg.seg_max(fill=0.0)
    vminf = np.nan_to_num(vmin)[seg.row_idx]
    vmaxf = np.nan_to_num(vmax)[seg.row_idx]
    binned = bin_tokens(raw, vminf, vmaxf, settings.grey_info) if raw.size else raw.copy()
    nz = binned != 0
    if settings.grey_info == 0:
        L = int(binned.max()) if binned.size else 1
        if L > 512:
            raise ValueError(
                "IBSI identity binning (grey_info=0) needs a small grey range; "
                f"got max level {L}. Use radiomics (<0) or matlab (>0) binning."
            )
    else:
        L = abs(settings.grey_info)
    pos = (np.arange(raw.size, dtype=np.int64) - seg.starts[seg.row_idx]) if raw.size else np.empty(0, np.int64)
    ctx = {"binned": binned, "nz": nz, "L": L, "pos": pos,
           "raw_nz": raw != 0, "vmin": vmin, "vmax": vmax}
    try:
        seg._tex_cache = (settings.grey_info, ctx)
    except AttributeError:
        pass
    return ctx


def _nz_count(seg: Segments, ctx) -> np.ndarray:
    """Per-row nonzero-token count, computed once per batch (several sections
    need it; seg_count is a full bincount over the flat array)."""
    c = ctx.get("_nzc")
    if c is None:
        c = ctx["_nzc"] = seg.seg_count(ctx["nz"])
    return c


def _degenerate_mask(seg: Segments, ctx) -> np.ndarray:
    """Rows with no texture signal: empty, constant, or all-background."""
    m = ctx.get("_deg")
    if m is None:
        rng_zero = ~(ctx["vmax"] > ctx["vmin"])
        m = ctx["_deg"] = rng_zero | ~(_nz_count(seg, ctx) > 0)
    return m


# --------------------------------------------------------------------------
# run extraction (GLRLM / GLSZM / GLDZM share it)
# --------------------------------------------------------------------------

def _runs(seg: Segments, ctx):
    """Vectorized RLE over nonzero binned values; zeros break runs.

    Cached per batch: GLRLM, GLSZM/GLDZM, and the d=1 leg of the multi-offset
    GLRLM all consume the identical stride-1 run list."""
    cached = ctx.get("_runs1")
    if cached is not None:
        return cached
    ctx["_runs1"] = out = _runs_uncached(seg, ctx)
    return out


def _runs_uncached(seg: Segments, ctx):
    binned, nz = ctx["binned"], ctx["nz"]
    total = binned.size
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z, z
    row_start = np.zeros(total, dtype=bool)
    row_start[seg.starts[seg.lengths > 0]] = True
    cont = np.zeros(total, dtype=bool)
    cont[1:] = nz[1:] & nz[:-1] & (binned[1:] == binned[:-1]) & ~row_start[1:]
    new_run = nz & ~cont
    run_id = np.cumsum(new_run) - 1
    n_runs = int(new_run.sum())
    if n_runs == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z, z
    run_len = np.bincount(run_id[nz], minlength=n_runs)
    run_row = seg.row_idx[new_run]
    run_level = binned[new_run]
    run_startpos = ctx["pos"][new_run]
    run_endpos = run_startpos + run_len - 1
    return run_row, run_level, run_len, run_startpos, run_endpos


def _sq_sum_by(rows: np.ndarray, keys: np.ndarray, n_rows: int) -> np.ndarray:
    """Σ_key (count(row, key))² per row, for arbitrary integer keys."""
    if rows.size == 0:
        return np.zeros(n_rows)
    kmax = int(keys.max()) + 1
    comp = rows * kmax + keys
    uniq, counts = np.unique(comp, return_counts=True)
    urow = uniq // kmax
    return np.bincount(urow, weights=counts.astype(np.float64) ** 2, minlength=n_rows)


def _entropy_by(rows: np.ndarray, keys: np.ndarray, denom: np.ndarray, n_rows: int) -> np.ndarray:
    """-Σ_cell p log2 p with p = cellcount/denom[row]."""
    if rows.size == 0:
        return np.zeros(n_rows)
    kmax = int(keys.max()) + 1
    comp = rows * kmax + keys
    uniq, counts = np.unique(comp, return_counts=True)
    urow = uniq // kmax
    p = counts / denom[urow]
    return -np.bincount(urow, weights=p * np.log2(p + EPS), minlength=n_rows)


def _run_family(seg, ctx, size_key: np.ndarray, prefix_map: dict[str, str],
                run_row, run_level, n_rows):
    """Shared SRE/LRE/GLN/... maths over (level, size) cells; `size_key` is
    run length for GLRLM/GLSZM and border distance for GLDZM."""
    out = {}
    g = run_level.astype(np.float64)
    s = size_key.astype(np.float64)
    Nr = np.bincount(run_row, minlength=n_rows).astype(np.float64)
    safe_Nr = np.where(Nr > 0, Nr, 1.0)
    Np = _nz_count(seg, ctx).astype(np.float64)

    def by_row(w):
        return np.bincount(run_row, weights=w, minlength=n_rows)

    out["SRE"] = by_row(1.0 / s ** 2) / safe_Nr
    out["LRE"] = by_row(s ** 2) / safe_Nr

    # GLN, RLN and RE all reduce over cell-count tables that derive from ONE
    # sorted-unique pass over the (row, level, size) cells — previously three
    # independent np.unique sorts (the section's dominant cost). Bit-identical
    # to the _sq_sum_by/_entropy_by paths they replace: the composite key is
    # a bijection of (level, size) so the cell set and its ascending order are
    # unchanged; marginal counts are exact integer sums (order-free); and the
    # squared-count terms still accumulate per row in the same ascending
    # (row, level) / (row, size) order, with absent dense cells contributing
    # exact +0.0 terms that cannot perturb a left-to-right float sum.
    lmax = int(run_level.max()) + 1 if run_level.size else 1
    keymax = int(size_key.max()) + 1 if size_key.size else 1
    comp = (run_row * lmax + run_level) * keymax + size_key
    uniq, counts = np.unique(comp, return_counts=True)
    urow = uniq // (lmax * keymax)
    cntf = counts.astype(np.float64)

    def _marg_sq(mkey, mmax):
        dense = np.bincount(mkey, weights=cntf, minlength=n_rows * mmax)
        nzc = np.flatnonzero(dense)
        return np.bincount(nzc // mmax, weights=dense[nzc] ** 2,
                           minlength=n_rows)

    out["GLN"] = _marg_sq(uniq // keymax, lmax) / safe_Nr
    out["GLNN"] = out["GLN"] / safe_Nr
    out["RLN"] = _marg_sq(urow * keymax + uniq % keymax, keymax) / safe_Nr
    out["RLNN"] = out["RLN"] / safe_Nr
    out["RP"] = Nr / np.where(Np > 0, Np, 1.0)
    # GLV/RV in exact-integer-numerator form: Σ(x−μ)²/N = (N·Σx² − (Σx)²)/N²
    # — x is an integer (grey level / run size), so the numerator is exact in
    # float64 and ONE final division makes the value bit-deterministic (the
    # repo's standard oracle-safe formulation; mathematically identical to the
    # reference's two-pass Σ(x−μ)²·p, gldzm.cpp:462-477)
    sg, sg2 = by_row(g), by_row(g * g)
    out["GLM"] = sg / safe_Nr
    out["GLV"] = (Nr * sg2 - sg ** 2) / safe_Nr ** 2
    ss_, ss2 = by_row(s), by_row(s * s)
    out["SM"] = ss_ / safe_Nr
    out["RV"] = (Nr * ss2 - ss_ ** 2) / safe_Nr ** 2
    pcell = cntf / safe_Nr[urow]
    out["RE"] = -np.bincount(urow, weights=pcell * np.log2(pcell + EPS),
                             minlength=n_rows)
    out["LGLRE"] = by_row(1.0 / g ** 2) / safe_Nr
    out["HGLRE"] = by_row(g ** 2) / safe_Nr
    out["SRLGLE"] = by_row(1.0 / (g ** 2 * s ** 2)) / safe_Nr
    out["SRHGLE"] = by_row(g ** 2 / s ** 2) / safe_Nr
    out["LRLGLE"] = by_row(s ** 2 / g ** 2) / safe_Nr
    out["LRHGLE"] = by_row(g ** 2 * s ** 2) / safe_Nr
    return {name: out[key] for name, key in prefix_map.items()}


_M_RL = {f"GLRLM_{k}": k for k in
         "SRE LRE GLN GLNN RLN RLNN RP GLV RV RE LGLRE HGLRE SRLGLE SRHGLE LRLGLE LRHGLE".split()}


def _glrlm_stats1(seg: Segments, ctx, n: int) -> dict[str, np.ndarray]:
    """Stride-1 GLRLM stat dict, memoized per batch — shared verbatim by
    glrlm_section and the d=1 leg of glrlm_multi_section (identical maths,
    identical run list, so recomputing would be pure duplicate work)."""
    cached = ctx.get("_glrlm1")
    if cached is None:
        run_row, run_level, run_len, _sp, _ep = _runs(seg, ctx)
        cached = ctx["_glrlm1"] = (
            _run_family(seg, ctx, run_len, _M_RL, run_row, run_level, n)
            if run_row.size else {k: np.zeros(n) for k in _M_RL}
        )
    return cached


def glrlm_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    ctx = _prep(seg, settings)
    run_row, run_level, run_len, sp, ep = _runs(seg, ctx)
    n = seg.n_rows
    m_rl = _M_RL
    out = dict(_glrlm_stats1(seg, ctx, n))
    # GLSZM: zones == runs in 1-D; same maths, GLSZM naming
    alias = dict(zip(GLSZM_NAMES,
                     ["GLRLM_" + k for k in
                      "SRE LRE GLN GLNN RLN RLNN RP GLV RV RE LGLRE HGLRE SRLGLE SRHGLE LRLGLE LRHGLE".split()]))
    for szn, rln in alias.items():
        out[szn] = out[rln].copy()
    # GLDZM over border distance
    if run_row.size:
        n_tok_r = seg.lengths[run_row]
        dist = np.minimum(sp, n_tok_r - 1 - ep) + 1
        m_dz = {"GLDZM_SDE": "SRE", "GLDZM_LDE": "LRE", "GLDZM_LGLZE": "LGLRE",
                "GLDZM_HGLZE": "HGLRE", "GLDZM_SDLGLE": "SRLGLE",
                "GLDZM_SDHGLE": "SRHGLE", "GLDZM_LDLGLE": "LRLGLE",
                "GLDZM_LDHGLE": "LRHGLE", "GLDZM_GLNU": "GLN",
                "GLDZM_GLNUN": "GLNN", "GLDZM_ZDNU": "RLN",
                "GLDZM_ZDNUN": "RLNN", "GLDZM_ZP": "RP", "GLDZM_GLM": "GLM",
                "GLDZM_GLV": "GLV", "GLDZM_ZDM": "SM", "GLDZM_ZDV": "RV",
                "GLDZM_ZDE": "RE"}
        out.update(_run_family(seg, ctx, dist, m_dz, run_row, run_level, n))
    else:
        out.update({k: np.zeros(n) for k in GLDZM_NAMES})
    deg = _degenerate_mask(seg, ctx)
    for k in list(out):
        out[k] = np.where(deg, 0.0, out[k])  # glrlm.cpp degenerate → 0
    return out


# --------------------------------------------------------------------------
# GLDM (dependence) + NGTDM
# --------------------------------------------------------------------------

def _window_sums(seg: Segments, ctx, d: int):
    """Per nonzero position: sum and count of nonzero binned neighbors within
    ±d (excluding self), via prefix sums with row-clamped bounds."""
    binned, nz = ctx["binned"], ctx["nz"]
    total = binned.size
    vals = np.where(nz, binned, 0).astype(np.float64)
    cs = np.concatenate([[0.0], np.cumsum(vals)])
    cn = np.concatenate([[0], np.cumsum(nz.astype(np.int64))])
    idx = np.arange(total, dtype=np.int64)
    row = seg.row_idx
    lo = np.maximum(idx - d, seg.starts[row])
    hi = np.minimum(idx + d, seg.starts[row] + seg.lengths[row] - 1)
    wsum = cs[hi + 1] - cs[lo]
    wcnt = cn[hi + 1] - cn[lo]
    nsum = wsum - vals
    ncnt = wcnt - nz.astype(np.int64)
    return nsum, ncnt


def gldm_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    ctx = _prep(seg, settings)
    n = seg.n_rows
    binned, nz, pos = ctx["binned"], ctx["nz"], ctx["pos"]
    total = binned.size
    d = settings.offset
    dep = np.zeros(total, dtype=np.int64)
    for k in range(1, d + 1):
        eq = np.zeros(total, dtype=bool)
        eq[k:] = nz[k:] & nz[:-k] & (binned[k:] == binned[:-k]) & (pos[k:] >= k)
        dep[k:] += eq[k:]
        dep[:-k] += eq[k:]
    dep_size = dep + 1  # center included (dependence size, gldm.cpp:174 analog)
    rows = seg.row_idx[nz]
    g = binned[nz].astype(np.float64)
    j = dep_size[nz].astype(np.float64)
    Nz = np.bincount(rows, minlength=n).astype(np.float64)
    safe = np.where(Nz > 0, Nz, 1.0)

    def by_row(w):
        return np.bincount(rows, weights=w, minlength=n)

    out = {
        "GLDM_SDE": by_row(1 / j ** 2) / safe,
        "GLDM_LDE": by_row(j ** 2) / safe,
        "GLDM_GLN": _sq_sum_by(rows, binned[nz], n) / safe,
        "GLDM_DN": _sq_sum_by(rows, dep_size[nz], n) / safe,
        "GLDM_LGLE": by_row(1 / g ** 2) / safe,
        "GLDM_HGLE": by_row(g ** 2) / safe,
        "GLDM_SDLGLE": by_row(1 / (g ** 2 * j ** 2)) / safe,
        "GLDM_SDHGLE": by_row(g ** 2 / j ** 2) / safe,
        "GLDM_LDLGLE": by_row(j ** 2 / g ** 2) / safe,
        "GLDM_LDHGLE": by_row(g ** 2 * j ** 2) / safe,
    }
    out["GLDM_DNN"] = out["GLDM_DN"] / safe
    mu_g = by_row(g) / safe
    out["GLDM_GLV"] = by_row((g - mu_g[rows]) ** 2) / safe
    mu_j = by_row(j) / safe
    out["GLDM_DV"] = by_row((j - mu_j[rows]) ** 2) / safe
    jmax = int(dep_size[nz].max()) + 1 if rows.size else 1
    out["GLDM_DE"] = _entropy_by(rows, binned[nz] * jmax + dep_size[nz], safe, n)

    # NGLDM (ngldm.cpp:270-340): same (level, dependence-count) matrix with
    # Ns = Nz, so the emphasis block aliases GLDM; distinct are the
    # normalized non-uniformity, the two means, count energy, and DCP ≡ 1
    # (per IBSI, ngldm.cpp:324).
    for ngl, gld in [("LDE", "SDE"), ("HDE", "LDE"), ("LGLCE", "LGLE"),
                     ("HGLCE", "HGLE"), ("LDLGLE", "SDLGLE"), ("LDHGLE", "SDHGLE"),
                     ("HDLGLE", "LDLGLE"), ("HDHGLE", "LDHGLE"), ("GLNU", "GLN"),
                     ("DCNU", "DN"), ("DCNUN", "DNN"), ("GLV", "GLV"),
                     ("DCV", "DV"), ("DCENT", "DE")]:
        out[f"NGLDM_{ngl}"] = out[f"GLDM_{gld}"].copy()
    out["NGLDM_GLNUN"] = out["GLDM_GLN"] / safe
    out["NGLDM_GLM"] = mu_g
    out["NGLDM_DCM"] = mu_j
    # Σ p² over distinct (level, count) cells
    out["NGLDM_DCENE"] = _sq_sum_by(rows, binned[nz] * jmax + dep_size[nz], n) / safe ** 2
    out["NGLDM_DCP"] = np.ones(n)
    deg = _degenerate_mask(seg, ctx)
    for k in list(out):
        out[k] = np.where(deg, settings.softnan, out[k])
    return out


def ngtdm_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    ctx = _prep(seg, settings)
    n = seg.n_rows
    binned, nz, L = ctx["binned"], ctx["nz"], ctx["L"]
    nsum, ncnt = _window_sums(seg, ctx, settings.offset)
    valid = nz & (ncnt > 0)  # nd > 0 requirement (ngtdm.cpp:141-146)
    rows = seg.row_idx[valid]
    g = binned[valid]
    with np.errstate(divide="ignore", invalid="ignore"):
        s_i = np.abs(binned[valid].astype(np.float64) - nsum[valid] / ncnt[valid])
    A = L + 1
    # per-row per-level N and S (dense: rows ≤ batch, A ≤ 65); bincount on a
    # composite key is ~10× np.add.at (buffered single pass vs per-element)
    key = rows * A + g
    Nmat = np.bincount(key, minlength=n * A).reshape(n, A).astype(np.float64)
    Smat = np.bincount(key, weights=s_i, minlength=n * A).reshape(n, A)
    Nvc = Nmat.sum(axis=1)
    safe_Nvc = np.where(Nvc > 0, Nvc, 1.0)
    p = Nmat / safe_Nvc[:, None]
    present = Nmat > 0
    Ngp = present.sum(axis=1).astype(np.float64)
    val = np.arange(A, dtype=np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        # Σ N_l·S_l is EXACT in float64 for offset=1 (every s_i is a dyadic
        # half), so computing coarseness as the single division Nvc/Σ(N·S)
        # — algebraically 1/Σ(p·s) — makes it bit-identical to an integer-
        # numerator SQL oracle (one rounding on each engine).
        psn = (Nmat * Smat).sum(axis=1)
        ps = psn / safe_Nvc
        coarseness = safe_Nvc / psn
        s_tot = Smat.sum(axis=1)
        # Algebraic factorization of the pairwise level sums (exact):
        #   Σᵢⱼ pᵢpⱼ(vᵢ-vⱼ)² = 2(Σpv² − (Σpv)²)           [p sums to 1]
        #   Σᵢⱼ (pᵢ+pⱼ)(vᵢ-vⱼ)² = 2(k·Σpv² − 2·T1·Σpv + T2) [k, T1=Σv, T2=Σv²
        #                                                    over present levels]
        #   Σᵢⱼ |vᵢpᵢ − vⱼpⱼ| = 2·Σᵣ (2r−k+1)·w₍ᵣ₎           [w=vp sorted per row]
        # Only COMPLEXITY is intrinsically pairwise — computed over i<j half
        # pairs and doubled. This matters: the sandbox memory bandwidth makes
        # every O(k²) element-op expensive.
        #
        # CONTRAST/STRENGTH/BUSYNESS are computed from the INTEGER index-
        # domain sums A1 = ΣN·v, A2 = ΣN·v², T1/T2 (all exact) with at most
        # two divisions in a fixed order — bit-identical to the SQL oracle
        # (the p = N/Nvc rationals algebraically cancel; same trick as
        # coarseness above).
        A1 = (Nmat * val[None, :]).sum(axis=1)
        A2 = (Nmat * val[None, :] ** 2).sum(axis=1)
        T1 = (present * val[None, :]).sum(axis=1)
        T2 = (present * val[None, :] ** 2).sum(axis=1)
        G = np.where(Ngp > 1, Ngp * (Ngp - 1), 1.0)
        d1 = (safe_Nvc * A2 - A1 ** 2) / ((safe_Nvc * safe_Nvc) * G)
        contrast = (2.0 * d1) * (s_tot / safe_Nvc)
        N2 = Ngp * A2 - 2.0 * (T1 * A1) + T2 * safe_Nvc
        stot2 = 2.0 * s_tot  # exact integer for offset 1 (dyadic halves)
        strength = np.where(
            s_tot > 0, (4.0 * N2) / np.where(s_tot > 0, safe_Nvc * stot2, 1.0), 0.0
        )

        # busyness: sorted-rank formula for Σ|wᵢ−wⱼ|, ranked on the INTEGER
        # per-level mass nv = N_l·v (same order as w = nv/Nvc) so the rank
        # sum B is an exact integer and busyness = psn/(2B) is one division
        prow, plev = np.nonzero(present)
        nv = Nmat[prow, plev] * plev
        order = np.lexsort((nv, prow))
        nv_sorted = nv[order]
        k_per = np.bincount(prow, minlength=n).astype(np.int64)
        starts_r = np.zeros(n, dtype=np.int64)
        np.cumsum(k_per[:-1], out=starts_r[1:])
        rank = np.arange(prow.size) - starts_r[prow]  # prow is sorted
        coef = 2.0 * rank - (k_per[prow] - 1)
        B = np.bincount(prow, weights=coef * nv_sorted, minlength=n)
        busyness = np.where(B > 0, psn / np.where(B > 0, 2.0 * B, 1.0), 0.0)

        # complexity: true pairwise over PRESENT levels only. Rows typically
        # hold Ngp ≪ A distinct levels, so enumerating the i<j present-level
        # pairs (Σ Ngp²/2 elements) beats the dense A-shift sweep (Σ n·(A−d)
        # elements) by ~Ngp²/A² — and is never worse. `prow`/`plev` from the
        # busyness block above are sorted by row, so a pair's two elements
        # always share a row. i<j half then ×2 (diagonal is 0).
        pi_elem = p[prow, plev]
        U_elem = pi_elem * Smat[prow, plev]
        ar_e = arange_buf(prow.size)
        local_rank = ar_e - starts_r[prow]
        npair = k_per[prow] - 1 - local_rank   # partners after this element
        first = np.repeat(ar_e, npair)
        grp_start = np.cumsum(npair) - npair
        m_pairs = first.size
        # pair gathers stream through arena buffers (np.take with out=) and
        # the 0..m ramp is the cached arena arange — at Σ Ngp²/2 pairs these
        # are the batch's largest temporaries, and this host taxes every
        # fresh multi-MB allocation with its slow first-touch path
        second = buf("ngt_second", m_pairs, np.int64)
        np.subtract(arange_buf(m_pairs), np.take(grp_start, first), out=second)
        second += first
        second += 1
        t_a = buf("ngt_ta", m_pairs)
        t_b = buf("ngt_tb", m_pairs)
        np.take(plev.astype(np.float64), second, out=t_a)
        t_a -= np.take(plev, first)            # dlev (> 0: levels sorted)
        np.take(U_elem, first, out=t_b)
        t_b += np.take(U_elem, second)
        t_a *= t_b                             # dlev · (U_i + U_j)
        np.take(pi_elem, first, out=t_b)
        t_b += np.take(pi_elem, second)
        t_a /= t_b                             # / (p_i + p_j)
        acc = np.bincount(np.take(prow, first), weights=t_a, minlength=n)
        complexity = 2.0 * acc / safe_Nvc

    deg = _degenerate_mask(seg, ctx) | (Ngp < 2)  # "binned data uninformative"
    out = {
        "NGTDM_COARSENESS": coarseness, "NGTDM_CONTRAST": contrast,
        "NGTDM_BUSYNESS": busyness, "NGTDM_COMPLEXITY": complexity,
        "NGTDM_STRENGTH": strength,
    }
    for k in list(out):
        out[k] = np.where(deg, settings.softnan, out[k])
    return out


# --------------------------------------------------------------------------
# GLCM
# --------------------------------------------------------------------------

def _glcm_stats(seg: Segments, ctx, settings: FeatureSettings, d: int) -> dict[str, np.ndarray]:
    """Sparse-cell GLCM at offset `d`: the joint matrix is never materialized —
    all feature sums run over the distinct (row, a, b) cells actually present
    (O(nnz)), with only the 1-D marginals px/py kept dense ((n_rows, levels+1)).

    Memoized per (offset, symmetric) within a batch: glcm_section and the
    multi-offset section share the d=1 computation verbatim (ctx is already
    keyed by grey_info in _prep, so the binning mode is part of the cache
    identity). Results are never mutated by callers (_AVE copies)."""
    memo = ctx.setdefault("_glcm_memo", {})
    mkey = (d, settings.symmetric_glcm, settings.softnan)
    hit = memo.get(mkey)
    if hit is not None:
        return hit
    memo[mkey] = out = _glcm_stats_uncached(seg, ctx, settings, d)
    return out


def _glcm_stats_uncached(seg: Segments, ctx, settings: FeatureSettings, d: int) -> dict[str, np.ndarray]:
    n = seg.n_rows
    binned, raw_nz, L = ctx["binned"], ctx["raw_nz"], ctx["L"]
    total = binned.size
    A = L + 1
    sym = settings.symmetric_glcm or settings.grey_info <= 0  # glcm.cpp:475-477

    # valid pairs: same row, both original intensities nonzero, both levels > 0
    # (binned > 0 is exactly ctx["nz"] — reuse the precomputed mask)
    nzm = ctx["nz"]
    if total > d:
        same_row = seg.row_idx[d:] == seg.row_idx[:-d]
        ok = same_row & raw_nz[d:] & raw_nz[:-d] & nzm[d:] & nzm[:-d]
        pr = seg.row_idx[:-d][ok]
        pa = binned[:-d][ok]
        pb = binned[d:][ok]
    else:
        pr = pa = pb = np.empty(0, np.int64)

    # per-row Ng (for IDN/IDMN) is offset-INDEPENDENT: memoize per batch so
    # the multi-offset section computes the (n, A) present-level scatter once
    # (ctx identity is already keyed by settings.grey_info in _prep)
    Ng_row = ctx.get("_glcm_ng")
    if Ng_row is None:
        lv_present = np.zeros((n, A), dtype=bool)
        if total:
            lv_present[seg.row_idx[nzm], binned[nzm]] = True
        if settings.grey_info < 0:
            # radiomics: Ng = count of unique nonzero binned levels (glcm.cpp:389-396)
            Ng_row = lv_present.sum(axis=1).astype(np.float64)
        elif settings.grey_info > 0:
            # matlab: fixed n levels (glcm.cpp:400-407)
            Ng_row = np.full(n, float(L))
        else:
            # IBSI: per-ROI max grey level (glcm.cpp:410-417)
            Ng_row = (lv_present * np.arange(A)).max(axis=1).astype(np.float64)
        ctx["_glcm_ng"] = Ng_row

    out = {k: np.full(n, settings.softnan) for k in GLCM_NAMES}
    if pr.size == 0:
        return out

    # distinct (row, a, b) cells with counts (symmetric accumulation doubles)
    key = pr * (A * A) + pa * A + pb
    if sym:
        key = np.concatenate([key, pr * (A * A) + pb * A + pa])
    uk, cnt = np.unique(key, return_counts=True)
    crow = uk // (A * A)
    ca = ((uk // A) % A).astype(np.float64)
    cb = (uk % A).astype(np.float64)
    sum_p = np.bincount(crow, weights=cnt, minlength=n)
    has = sum_p > 0
    p = cnt / sum_p[crow]

    # crow is non-decreasing (np.unique sorts, row is the top key digit);
    # bincount accumulates strictly left-to-right (reduceat would be lighter
    # on traffic but sums pairwise — NOT bit-identical for rational weights)
    seg_starts = np.flatnonzero(np.r_[True, crow[1:] != crow[:-1]])
    seg_rows = crow[seg_starts]

    def by_row(w):
        return np.bincount(crow, weights=w, minlength=n)

    # dense 1-D marginals are cheap: (n_rows, A); bincount beats np.add.at
    pxm = np.bincount(crow * A + ca.astype(np.int64), weights=p,
                      minlength=n * A).reshape(n, A)
    pym = np.bincount(crow * A + cb.astype(np.int64), weights=p,
                      minlength=n * A).reshape(n, A)
    val = np.arange(A, dtype=np.float64)
    mux = (pxm * val).sum(axis=1)
    muy = (pym * val).sum(axis=1)
    sigx = np.sqrt((pxm * (val[None, :] - mux[:, None]) ** 2).sum(axis=1))
    sigy = np.sqrt((pym * (val[None, :] - muy[:, None]) ** 2).sum(axis=1))
    hx = -(np.where(pxm > 0, pxm * np.log2(pxm + EPS), 0.0)).sum(axis=1)
    hy = -(np.where(pym > 0, pym * np.log2(pym + EPS), 0.0)).sum(axis=1)

    diff = np.abs(ca - cb)
    summ = ca + cb
    # integer-numerator forms (Σ over exact int products, ONE final division):
    # mathematically identical to Σ p·w but bit-deterministic and identical to
    # an exact-integer SQL oracle — rationals otherwise land on rounding
    # boundaries and parallel-sum jitter flips the 4th decimal.
    cntf = cnt.astype(np.float64)
    safe_sp = np.where(sum_p > 0, sum_p, 1.0)
    asm_ = by_row(cntf * cntf) / safe_sp ** 2
    je = -by_row(p * np.log2(p + EPS))
    contrast = by_row(cntf * diff ** 2) / safe_sp
    dis = by_row(cntf * diff) / safe_sp
    hom1 = by_row(p / (1.0 + diff))
    idm = by_row(p / (1.0 + diff ** 2))
    Ngc = np.where(Ng_row > 0, Ng_row, 1.0)
    idn = by_row(p / (1.0 + diff / Ngc[crow]))
    idmn = by_row(p / (1.0 + diff ** 2 / Ngc[crow] ** 2))
    iv = by_row(np.where(diff > 0, p / np.where(diff > 0, diff, 1) ** 2, 0.0))
    acor = by_row(cntf * ca * cb) / safe_sp
    jave = by_row(cntf * ca) / safe_sp
    jmax = np.zeros(n)
    jmax[seg_rows] = np.maximum.reduceat(p, seg_starts)
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = (acor - mux * muy) / (sigx * sigy)
        cs = summ - (mux + muy)[crow]
        cs2 = cs * cs  # multiply chain: np.power's int-exponent ≥3 pow loop
        clut = by_row(p * cs2)
        clus = by_row(p * (cs2 * cs))
        clup = by_row(p * (cs2 * cs2))
        jvar = by_row(p * (ca - jave[crow]) ** 2)
        sumave = by_row(cntf * summ) / safe_sp
        sumvar = by_row(p * (summ - sumave[crow]) ** 2)
        difave = dis
        difvar = by_row(p * (diff - difave[crow]) ** 2)
        variance = by_row(p * (ca - mux[crow]) ** 2)

        # marginal-k entropies over (row, k) cells. Dense bincount instead of
        # np.unique(return_inverse) — the argsort+cumsum inverse path was the
        # single most expensive op in the section. Bit-identical: cell masses
        # accumulate in the same array order, per-row terms sum via a second
        # sequential bincount in the same ascending-k order the sparse path
        # walked (absent cells contribute an exact ±0.0 term, which cannot
        # perturb a left-to-right float sum), and the negation happens after
        # the row sum exactly as before.
        def marg_entropy(kvals, kmax):
            mk = crow * kmax + kvals.astype(np.int64)
            size = n * kmax
            q = np.bincount(mk, weights=p, minlength=size)
            t = q * np.log2(q + EPS)
            return -np.bincount(arange_buf(size) // kmax, weights=t, minlength=n)

        sument = marg_entropy(summ, 2 * A)
        difent = marg_entropy(diff, A)

        # information measures (glcm.cpp:856-915); hxy2 factorizes to hx+hy up
        # to the +eps inside the log (error ~1e-12, below oracle tolerance)
        hxy1 = -by_row(p * np.log2(pxm[crow, ca.astype(np.int64)] * pym[crow, cb.astype(np.int64)] + EPS))
        hxy2 = hx + hy
        im1 = (je - hxy1) / np.maximum(hx, hy)
        im2 = np.sqrt(np.maximum(0.0, 1.0 - np.exp(-2.0 * (hxy2 - je))))

    vals = {
        "GLCM_ASM": asm_, "GLCM_ACOR": acor, "GLCM_CLUPROM": clup,
        "GLCM_CLUSHADE": clus, "GLCM_CLUTEND": clut, "GLCM_CONTRAST": contrast,
        "GLCM_CORRELATION": corr, "GLCM_DIFAVE": difave, "GLCM_DIFENTRO": difent,
        "GLCM_DIFVAR": difvar, "GLCM_DIS": dis, "GLCM_ENERGY": asm_,
        # HOM2 (featureset.h:188, glcm.cpp:1057-1071) sums p/(1+|Δ|²) over the
        # joint matrix — algebraically the same sum f_idm() takes over the
        # difference marginal Pxmy (glcm.cpp:~1074), so the two codes coincide
        "GLCM_ENTROPY": je, "GLCM_HOM1": hom1, "GLCM_HOM2": idm, "GLCM_ID": hom1,
        "GLCM_IDN": idn, "GLCM_IDM": idm, "GLCM_IDMN": idmn,
        "GLCM_INFOMEAS1": im1, "GLCM_INFOMEAS2": im2, "GLCM_IV": iv,
        "GLCM_JAVE": jave, "GLCM_JE": je, "GLCM_JMAX": jmax, "GLCM_JVAR": jvar,
        "GLCM_SUMAVERAGE": sumave, "GLCM_SUMENTROPY": sument,
        "GLCM_SUMVARIANCE": sumvar, "GLCM_VARIANCE": variance,
    }
    deg = _degenerate_mask(seg, ctx) | ~has
    for k, v in vals.items():
        out[k] = np.where(deg, settings.softnan, v)
    return out


def glcm_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    ctx = _prep(seg, settings)
    return _glcm_stats(seg, ctx, settings, settings.offset)


# --------------------------------------------------------------------------
# multi-offset sections — the 1-D analog of the reference's per-angle columns
# (output_2_csv.cpp:97-127 emits every GLCM/GLRLM stat per angle {0,45,90,135}
# plus *_AVE averages, featureset.h:205-268). Here the "angles" are stride
# offsets d: GLCM pairs (i, i+d); GLRLM runs over the d interleaved
# subsequences tokens[i::d] (the 1-D counterpart of traversing a raster at
# direction stride (1,1) etc.). _AVE accumulates sequentially in tuple order
# then divides once, so oracles can replay the identical IEEE op sequence.
# --------------------------------------------------------------------------

MULTI_OFFSETS = FeatureSettings().offsets

GLCM_MULTI_NAMES = [f"{n}_D{d}" for n in GLCM_NAMES for d in MULTI_OFFSETS] + [
    f"{n}_AVE" for n in GLCM_NAMES
]
GLRLM_MULTI_NAMES = [f"{n}_D{d}" for n in GLRLM_NAMES for d in MULTI_OFFSETS] + [
    f"{n}_AVE" for n in GLRLM_NAMES
]


def _ave_over_offsets(per_offset: dict[int, dict[str, np.ndarray]],
                      base_names: list[str], offs: tuple[int, ...]):
    out: dict[str, np.ndarray] = {}
    for nm in base_names:
        acc = per_offset[offs[0]][nm].astype(np.float64, copy=True)
        for d in offs[1:]:
            acc = acc + per_offset[d][nm]
        out[f"{nm}_AVE"] = acc / len(offs)
    return out


def _check_multi_offsets(settings: FeatureSettings) -> None:
    """The *_D{d} feature names are registered once at import from the default
    offsets tuple; a runtime settings.offsets that differs would emit keys the
    registry doesn't know, surfacing as an opaque KeyError deep in
    extract_features — fail early and clearly instead."""
    if tuple(settings.offsets) != tuple(MULTI_OFFSETS):
        raise ValueError(
            f"multi-offset sections are registered for offsets={MULTI_OFFSETS}; "
            f"got settings.offsets={tuple(settings.offsets)}. Custom offsets "
            f"require re-registering the *_D{{d}} feature names."
        )


def glcm_multi_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    _check_multi_offsets(settings)
    ctx = _prep(seg, settings)
    offs = settings.offsets
    per = {d: _glcm_stats(seg, ctx, settings, d) for d in offs}
    out = {f"{nm}_D{d}": per[d][nm] for d in offs for nm in GLCM_NAMES}
    out.update(_ave_over_offsets(per, GLCM_NAMES, offs))
    return out


def _runs_strided(seg: Segments, ctx, d: int):
    """RLE over the d interleaved subsequences of each row (stride-d runs).

    Elements are permuted to (row, phase=pos%d, pos//d) order; a run is a
    maximal chain i, i+d, i+2d… of equal nonzero binned values within a row.
    Returns (run_row, run_level, run_len) — border distances are undefined
    for strided traversal, so GLDZM stays stride-1 (like the reference, where
    GLDZM/GLSZM are not angled families).
    """
    binned, nz, pos = ctx["binned"], ctx["nz"], ctx["pos"]
    total = binned.size
    z = np.empty(0, np.int64)
    if total == 0:
        return z, z, z
    # the stride permutation is computed ARITHMETICALLY, not by comparison
    # sort: within a row of length len, the element at pos lands at rank
    # (len//d)·(pos%d) + min(pos%d, len%d) + pos//d — the count of positions
    # with a smaller phase plus its index inside its own phase chain. This
    # is exactly the (row, pos%d, pos//d) lexsort order (keys are unique per
    # element, so the permutation is identical and every downstream value is
    # bit-identical), at O(N) scatter cost instead of O(N log N) sort —
    # lexsort was the dominant cost of the multi-offset GLRLM section.
    phase = pos % d
    lens = seg.lengths[seg.row_idx]
    rank = (lens // d) * phase + np.minimum(phase, lens % d) + pos // d
    order = np.empty(total, np.int64)
    order[seg.starts[seg.row_idx] + rank] = np.arange(total, dtype=np.int64)
    b = binned[order]
    m = nz[order]
    row_p = seg.row_idx[order]
    phase_p = pos[order] % d
    cont = np.zeros(total, dtype=bool)
    cont[1:] = (
        m[1:] & m[:-1] & (b[1:] == b[:-1])
        & (row_p[1:] == row_p[:-1]) & (phase_p[1:] == phase_p[:-1])
    )
    new_run = m & ~cont
    n_runs = int(new_run.sum())
    if n_runs == 0:
        return z, z, z
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id[m], minlength=n_runs)
    return row_p[new_run], b[new_run], run_len


def glrlm_multi_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    _check_multi_offsets(settings)
    ctx = _prep(seg, settings)
    offs = settings.offsets
    n = seg.n_rows
    m_rl = _M_RL
    deg = _degenerate_mask(seg, ctx)
    per: dict[int, dict[str, np.ndarray]] = {}
    for d in offs:
        if d == 1:
            # stride-1 subsequence == the row itself: identical run list and
            # stats as glrlm_section — reuse the memoized dict instead of
            # re-deriving it through the (lexsort) strided path
            stats = _glrlm_stats1(seg, ctx, n)
        else:
            run_row, run_level, run_len = _runs_strided(seg, ctx, d)
            stats = (
                _run_family(seg, ctx, run_len, m_rl, run_row, run_level, n)
                if run_row.size else {k: np.zeros(n) for k in m_rl}
            )
        per[d] = {k: np.where(deg, 0.0, v) for k, v in stats.items()}
    out = {f"{nm}_D{d}": per[d][nm] for d in offs for nm in GLRLM_NAMES}
    out.update(_ave_over_offsets(per, GLRLM_NAMES, offs))
    return out


# --------------------------------------------------------------------------
# registry wiring
# --------------------------------------------------------------------------

from nyxus_spark.features.registry import Section  # noqa: E402

TEXTURE_SECTIONS = [
    Section("glcm", glcm_section, tuple(GLCM_NAMES)),
    Section("glrlm", glrlm_section, tuple(GLRLM_NAMES + GLSZM_NAMES + GLDZM_NAMES)),
    Section("gldm", gldm_section, tuple(GLDM_NAMES + NGLDM_NAMES)),
    Section("ngtdm", ngtdm_section, tuple(NGTDM_NAMES)),
    Section("glcm_multi", glcm_multi_section, tuple(GLCM_MULTI_NAMES)),
    Section("glrlm_multi", glrlm_multi_section, tuple(GLRLM_MULTI_NAMES)),
]
