"""Texture kernels vs independent scalar oracle (per family, all binning
modes) + hand-checked micro-goldens, nyxus-fixture style (FIXTURES.md T4)."""

import math

import numpy as np
import pytest

from nyxus_spark.features.segmented import Segments
from nyxus_spark.features.texture import (
    GLCM_NAMES, GLDM_NAMES, GLDZM_NAMES, GLRLM_NAMES, GLSZM_NAMES, NGTDM_NAMES,
    glcm_section, gldm_section, glrlm_section, ngtdm_section,
)
from nyxus_spark.settings import FeatureSettings
from tests import oracle_texture as ref

PHANTOM = [1, 2, 5, 2, 3, 3, 2, 1, 3, 1, 1, 3, 5, 5, 2, 1, 1, 1, 1, 2, 1, 2, 4, 3, 5]
RNG = np.random.RandomState(42)
CASES = [
    PHANTOM,
    [1, 1, 2, 2, 2, 0, 3],
    [7],
    [5, 5, 5, 5],
    [0, 0, 0],
    list(RNG.randint(0, 251, size=500)),
    list(RNG.randint(1, 8, size=200)),
    [0, 1] * 40,
    [10, 0, 10, 0, 10, 20, 20, 0],
]
MODES = [-4, 4, 0, -64, 64]


def _seg(cases):
    return Segments([np.array(c, dtype=np.int64) for c in cases])


def _check(got, i, exp, names, ctx=""):
    if exp is None:
        for f in names:
            assert math.isnan(got[f][i]), f"{ctx} {f} row{i}: got {got[f][i]}, want NaN"
        return
    for f in names:
        if f not in exp:
            continue
        e, g = exp[f], got[f][i]
        if isinstance(e, float) and math.isnan(e):
            assert math.isnan(g), f"{ctx} {f} row{i}"
        elif math.isinf(e):
            assert math.isinf(g) or g > 1e12, f"{ctx} {f} row{i}: {g} vs inf"
        else:
            assert np.isclose(g, e, rtol=1e-8, atol=1e-10), f"{ctx} {f} row{i}: {g} != {e}"


@pytest.mark.parametrize("grey", MODES)
def test_glrlm_family_vs_oracle(grey):
    s = FeatureSettings(grey_info=grey)
    got = glrlm_section(_seg(CASES), s)
    for i, c in enumerate(CASES):
        exp = ref.glrlm_ref(c, grey)
        _check(got, i, exp, GLRLM_NAMES + GLDZM_NAMES, f"grey={grey}")
        # GLSZM ≡ GLRLM in 1-D
        for szn, rln in zip(GLSZM_NAMES, GLRLM_NAMES):
            a, b = got[szn][i], got[rln][i]
            assert (math.isnan(a) and math.isnan(b)) or a == b


@pytest.mark.parametrize("grey", MODES)
def test_gldm_vs_oracle(grey):
    s = FeatureSettings(grey_info=grey)
    got = gldm_section(_seg(CASES), s)
    for i, c in enumerate(CASES):
        exp = ref.gldm_ref(c, grey)
        _check(got, i, exp, GLDM_NAMES, f"grey={grey}")


@pytest.mark.parametrize("grey", MODES)
def test_ngtdm_vs_oracle(grey):
    s = FeatureSettings(grey_info=grey)
    got = ngtdm_section(_seg(CASES), s)
    for i, c in enumerate(CASES):
        exp = ref.ngtdm_ref(c, grey)
        _check(got, i, exp, NGTDM_NAMES, f"grey={grey}")


@pytest.mark.parametrize("grey", MODES)
def test_glcm_vs_oracle(grey):
    s = FeatureSettings(grey_info=grey)
    got = glcm_section(_seg(CASES), s)
    for i, c in enumerate(CASES):
        exp = ref.glcm_ref(c, grey)
        _check(got, i, exp, GLCM_NAMES, f"grey={grey}")


def test_micro_goldens():
    # [1,1,2,2,2,0,3] (IBSI identity): runs (1,2),(2,3),(3,1); Np=6
    got = glrlm_section(_seg([[1, 1, 2, 2, 2, 0, 3]]), FeatureSettings(grey_info=0))
    assert np.isclose(got["GLRLM_RP"][0], 3 / 6)
    assert np.isclose(got["GLRLM_SRE"][0], (1 / 4 + 1 / 9 + 1) / 3)
    assert np.isclose(got["GLRLM_HGLRE"][0], (1 + 4 + 9) / 3)
    # GLDM d=1 on [5,5,5,9] ibsi: deps sizes [2,3,2,1]
    got = gldm_section(_seg([[5, 5, 5, 9]]), FeatureSettings(grey_info=0, offset=1))
    assert np.isclose(got["GLDM_LDE"][0], (4 + 9 + 4 + 1) / 4)
    # GLCM on [1,2,1,2] ibsi sym: pairs (1,2),(2,1),(1,2) → sym counts 1-2:3,2-1:3
    got = glcm_section(_seg([[1, 2, 1, 2]]), FeatureSettings(grey_info=0, symmetric_glcm=True))
    assert np.isclose(got["GLCM_CONTRAST"][0], 1.0)  # all pairs differ by 1
    assert np.isclose(got["GLCM_ASM"][0], 0.5)       # p = [.5,.5] → Σp² = .5


def test_extract_features_all_groups(spark, sf_dir):
    from nyxus_spark.features import extract_features
    from nyxus_spark.sources import tokens_versions

    df = tokens_versions(spark, sf_dir).limit(50)
    out = extract_features(df, ["*ALL*"], keep_tokens=True).toPandas()
    assert len(out) == 50
    row = out[out["tokens"].apply(lambda t: len(set(t)) > 3)].iloc[0]
    exp = ref.glrlm_ref(list(row["tokens"]), 64)
    assert np.isclose(row["GLRLM_SRE"], exp["GLRLM_SRE"], rtol=1e-8)
    expc = ref.glcm_ref(list(row["tokens"]), 64)
    assert np.isclose(row["GLCM_CONTRAST"], expc["GLCM_CONTRAST"], rtol=1e-8)
