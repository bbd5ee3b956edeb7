"""Positional (geometric) moments over token streams.

1-D recast of the reference's geometric-moment family
(/root/reference/src/nyx/features/2d_geomoments.cpp:20,335): the sequence
position i plays the role of the spatial coordinate and the token value the
role of intensity. Raw moments m_p = Σ i^p · w_i, central moments
μ_p = Σ (i - c)^p · w_i about the weighted centroid c = m1/m0, normalized
central moments η_p = μ_p / m0^(1+p/2) (scale invariants), plus the
unweighted ("shape") variants with w ≡ 1 over nonzero tokens — the 1-D
analog of mask-vs-intensity moments.
"""

from __future__ import annotations

import numpy as np

from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

MOMENTS_FEATURES = [
    "MOM_RAW_0", "MOM_RAW_1", "MOM_RAW_2", "MOM_RAW_3", "MOM_RAW_4",
    # normalized RAW moments — the 1-D analog of the reference's
    # normalized-raw code block (2d_geomoments.cpp:335 norm-raw family):
    # m_p / m0^(1+p/2), the scale-invariant raw forms
    "MOM_NORM_RAW_1", "MOM_NORM_RAW_2", "MOM_NORM_RAW_3", "MOM_NORM_RAW_4",
    "MOM_CENTRAL_2", "MOM_CENTRAL_3", "MOM_CENTRAL_4",
    "MOM_NORM_CENTRAL_2", "MOM_NORM_CENTRAL_3", "MOM_NORM_CENTRAL_4",
    "MOM_WEIGHTED_CENTROID",
    # Hu-analog 1-D invariants (2d_geomoments.cpp Hu codes → translation-
    # and reflection-invariant combinations of the normalized centrals):
    # HU1 = η2, HU2 = η3² (odd order squared → reflection-invariant),
    # HU3 = η4 − 3η2² (excess-kurtosis form), HU4 = μ4/μ2² (standardized
    # kurtosis — scale-free like Hu's ratio forms), HU5 = μ3²/μ2³ (squared
    # standardized skewness), HU6 = η2·η4 − η3² (the determinant-form
    # analog of Hu's I6: a 2×2 Gram determinant of the normalized
    # centrals). Each is a SINGLE exact rational in the raw moments — or a
    # fixed IEEE chain of two exact rationals (HU6) — which is what the
    # driver query recomputes decimal-exactly.
    "MOM_HU_1", "MOM_HU_2", "MOM_HU_3", "MOM_HU_4", "MOM_HU_5", "MOM_HU_6",
    # unweighted ("shape") family — the 1-D analog of the reference's
    # mask-vs-intensity moment split (2d_geomoments.cpp SPAT vs WEIGHTED
    # codes): w ≡ 1 over nonzero tokens
    "MOM_SHAPE_RAW_0", "MOM_SHAPE_RAW_1", "MOM_SHAPE_RAW_2", "MOM_SHAPE_RAW_3",
    "MOM_SHAPE_RAW_4",
    "MOM_SHAPE_NORM_RAW_1", "MOM_SHAPE_NORM_RAW_2", "MOM_SHAPE_NORM_RAW_3",
    "MOM_SHAPE_NORM_RAW_4",
    "MOM_SHAPE_CENTROID", "MOM_SHAPE_CENTRAL_2", "MOM_SHAPE_CENTRAL_3",
    "MOM_SHAPE_CENTRAL_4", "MOM_SHAPE_NORM_CENTRAL_2",
    "MOM_SHAPE_NORM_CENTRAL_3", "MOM_SHAPE_NORM_CENTRAL_4",
    "MOM_SHAPE_HU_4", "MOM_SHAPE_HU_5",
    # midpoint-central family: moments about the sequence CENTER
    # h = (n−1)/2 — the 1-D analog of the reference's moments about the
    # ROI/bbox center (2d_geomoments.cpp origin-moment block), as opposed
    # to the centroid-centered μ family. About a HALF-INTEGER center, the
    # 2^p-scaled numerators are exact integers (binomial in the raw
    # moments), so the driver gate recomputes them decimal-exactly.
    "MOM_MID_1", "MOM_MID_2", "MOM_MID_3", "MOM_MID_4",
    "MOM_SHAPE_MID_2", "MOM_SHAPE_MID_3", "MOM_SHAPE_MID_4",
]


def moments_section(seg: Segments, settings: FeatureSettings) -> dict[str, np.ndarray]:
    n = seg.n_rows
    nan = settings.softnan
    w = seg.flat.astype(np.float64)
    pos = (np.arange(w.size, dtype=np.float64) - seg.starts[seg.row_idx]) if w.size else w

    with np.errstate(divide="ignore", invalid="ignore"):
        # powers as explicit multiply chains (pos², pos³=pos²·pos, …):
        # np.power's integer-exponent ≥ 3 path is the slow pow loop
        pos2 = pos * pos
        m0 = seg.seg_sum(w)
        m1 = seg.seg_sum(w * pos)
        m2 = seg.seg_sum(w * pos2)
        m3 = seg.seg_sum(w * (pos2 * pos))
        m4 = seg.seg_sum(w * (pos2 * pos2))
        c = m1 / m0
        dc = pos - c[seg.row_idx]
        dc2 = dc * dc
        mu2 = seg.seg_sum(w * dc2)
        mu3 = seg.seg_sum(w * (dc2 * dc))
        mu4 = seg.seg_sum(w * (dc2 * dc2))
        eta2 = mu2 / m0 ** 2.0
        eta3 = mu3 / m0 ** 2.5
        eta4 = mu4 / m0 ** 3.0
        hu1 = eta2
        hu2 = eta3 * eta3
        hu3 = eta4 - 3.0 * (eta2 * eta2)
        hu4 = mu4 / (mu2 * mu2)
        hu5 = (mu3 * mu3) / ((mu2 * mu2) * mu2)
        hu6 = eta2 * eta4 - eta3 * eta3
        # normalized raw moments m_p / m0^(1+p/2) (multiply chains + one
        # correctly-rounded sqrt — never pow())
        sq_m0 = np.sqrt(m0)
        nr1 = m1 / (m0 * sq_m0)
        nr2 = m2 / (m0 * m0)
        nr3 = m3 / ((m0 * m0) * sq_m0)
        nr4 = m4 / ((m0 * m0) * m0)

        nzm = seg.flat != 0
        s0 = seg.seg_count(nzm).astype(np.float64)
        s1 = seg.seg_sum_where(pos, nzm)
        s2 = seg.seg_sum_where(pos2, nzm)
        s3 = seg.seg_sum_where(pos2 * pos, nzm)
        s4 = seg.seg_sum_where(pos2 * pos2, nzm)
        sc = s1 / s0
        sdc = pos - sc[seg.row_idx]
        sdc2 = sdc * sdc
        smu2 = seg.seg_sum_where(sdc2, nzm)
        smu3 = seg.seg_sum_where(sdc2 * sdc, nzm)
        smu4 = seg.seg_sum_where(sdc2 * sdc2, nzm)
        seta2 = smu2 / s0 ** 2.0
        seta3 = smu3 / s0 ** 2.5
        seta4 = smu4 / s0 ** 3.0
        shu4 = smu4 / (smu2 * smu2)
        shu5 = (smu3 * smu3) / ((smu2 * smu2) * smu2)
        sq_s0 = np.sqrt(s0)
        snr1 = s1 / (s0 * sq_s0)
        snr2 = s2 / (s0 * s0)
        snr3 = s3 / ((s0 * s0) * sq_s0)
        snr4 = s4 / ((s0 * s0) * s0)

        # midpoint-central family via the binomial chain in the raw moments
        # (scalar ops on existing sums — no extra passes over the tokens)
        h = (seg.lengths.astype(np.float64) - 1.0) * 0.5
        h2 = h * h
        mid1 = m1 - h * m0
        mid2 = (m2 - (2.0 * h) * m1) + h2 * m0
        mid3 = ((m3 - (3.0 * h) * m2) + (3.0 * h2) * m1) - (h2 * h) * m0
        mid4 = (((m4 - (4.0 * h) * m3) + (6.0 * h2) * m2)
                - (4.0 * (h2 * h)) * m1) + (h2 * h2) * m0
        smid2 = (s2 - (2.0 * h) * s1) + h2 * s0
        smid3 = ((s3 - (3.0 * h) * s2) + (3.0 * h2) * s1) - (h2 * h) * s0
        smid4 = (((s4 - (4.0 * h) * s3) + (6.0 * h2) * s2)
                 - (4.0 * (h2 * h)) * s1) + (h2 * h2) * s0

    ok = (seg.lengths > 0) & (m0 > 0)
    ok_s = (seg.lengths > 0) & (s0 > 0)
    out = {
        "MOM_RAW_0": np.where(seg.lengths > 0, m0, nan),
        "MOM_RAW_1": np.where(seg.lengths > 0, m1, nan),
        "MOM_RAW_2": np.where(seg.lengths > 0, m2, nan),
        "MOM_RAW_3": np.where(seg.lengths > 0, m3, nan),
        "MOM_RAW_4": np.where(seg.lengths > 0, m4, nan),
        "MOM_CENTRAL_2": np.where(ok, mu2, nan),
        "MOM_CENTRAL_3": np.where(ok, mu3, nan),
        "MOM_CENTRAL_4": np.where(ok, mu4, nan),
        "MOM_NORM_CENTRAL_2": np.where(ok, eta2, nan),
        "MOM_NORM_CENTRAL_3": np.where(ok, eta3, nan),
        "MOM_NORM_CENTRAL_4": np.where(ok, eta4, nan),
        "MOM_WEIGHTED_CENTROID": np.where(ok, c, nan),
        "MOM_HU_1": np.where(ok, hu1, nan),
        "MOM_HU_2": np.where(ok, hu2, nan),
        "MOM_HU_3": np.where(ok, hu3, nan),
        "MOM_HU_4": np.where(ok & (mu2 > 0), hu4, nan),
        "MOM_HU_5": np.where(ok & (mu2 > 0), hu5, nan),
        "MOM_HU_6": np.where(ok, hu6, nan),
        "MOM_NORM_RAW_1": np.where(ok, nr1, nan),
        "MOM_NORM_RAW_2": np.where(ok, nr2, nan),
        "MOM_NORM_RAW_3": np.where(ok, nr3, nan),
        "MOM_NORM_RAW_4": np.where(ok, nr4, nan),
        "MOM_SHAPE_RAW_0": np.where(ok_s, s0, nan),
        "MOM_SHAPE_RAW_1": np.where(ok_s, s1, nan),
        "MOM_SHAPE_RAW_2": np.where(ok_s, s2, nan),
        "MOM_SHAPE_RAW_3": np.where(ok_s, s3, nan),
        "MOM_SHAPE_RAW_4": np.where(ok_s, s4, nan),
        "MOM_SHAPE_CENTROID": np.where(ok_s, sc, nan),
        "MOM_SHAPE_CENTRAL_2": np.where(ok_s, smu2, nan),
        "MOM_SHAPE_CENTRAL_3": np.where(ok_s, smu3, nan),
        "MOM_SHAPE_CENTRAL_4": np.where(ok_s, smu4, nan),
        "MOM_SHAPE_NORM_CENTRAL_2": np.where(ok_s, seta2, nan),
        "MOM_SHAPE_NORM_CENTRAL_3": np.where(ok_s, seta3, nan),
        "MOM_SHAPE_NORM_CENTRAL_4": np.where(ok_s, seta4, nan),
        "MOM_SHAPE_HU_4": np.where(ok_s & (smu2 > 0), shu4, nan),
        "MOM_SHAPE_HU_5": np.where(ok_s & (smu2 > 0), shu5, nan),
        "MOM_SHAPE_NORM_RAW_1": np.where(ok_s, snr1, nan),
        "MOM_SHAPE_NORM_RAW_2": np.where(ok_s, snr2, nan),
        "MOM_SHAPE_NORM_RAW_3": np.where(ok_s, snr3, nan),
        "MOM_SHAPE_NORM_RAW_4": np.where(ok_s, snr4, nan),
        "MOM_MID_1": np.where(seg.lengths > 0, mid1, nan),
        "MOM_MID_2": np.where(seg.lengths > 0, mid2, nan),
        "MOM_MID_3": np.where(seg.lengths > 0, mid3, nan),
        "MOM_MID_4": np.where(seg.lengths > 0, mid4, nan),
        "MOM_SHAPE_MID_2": np.where(ok_s, smid2, nan),
        "MOM_SHAPE_MID_3": np.where(ok_s, smid3, nan),
        "MOM_SHAPE_MID_4": np.where(ok_s, smid4, nan),
    }
    return out
