"""First-order kernel vs independent scalar oracle + golden values.

Mirrors the reference test strategy (SURVEY.md §5): golden fixtures with
hand-checkable expectations (tests/test_data.h style) plus oracle sweeps.
"""

import math

import numpy as np
import pandas as pd
import pytest

from nyxus_spark.features.firstorder import FIRSTORDER_FEATURES, firstorder_section
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings
from tests.oracle_firstorder import ref_firstorder

SET = FeatureSettings()

# FIXTURES.md T4: 5x5 GLCM phantom flattened (glcm.cpp:366-372) and friends
PHANTOM = [1, 2, 5, 2, 3, 3, 2, 1, 3, 1, 1, 3, 5, 5, 2, 1, 1, 1, 1, 2, 1, 2, 4, 3, 5]
CASES = [
    PHANTOM,
    [7],                       # single token
    [5, 5, 5, 5],              # constant (blank-ROI path)
    [0, 0, 0],                 # all-zero
    list(range(100)),
    [0, 1] * 50,
    [250, 0, 131, 17, 17, 17, 3],
    list(np.random.RandomState(42).randint(0, 251, size=997)),
    list(np.random.RandomState(7).randint(0, 50257, size=257)),
]


def _kernel_rows(cases):
    seg = Segments([np.array(c, dtype=np.int64) for c in cases])
    return firstorder_section(seg, SET)


def test_kernel_matches_scalar_oracle():
    got = _kernel_rows(CASES)
    for i, c in enumerate(CASES):
        exp = ref_firstorder(c, n_bins=SET.n_bins)
        for f in FIRSTORDER_FEATURES:
            g, e = got[f][i], exp[f]
            if math.isnan(e):
                assert math.isnan(g), f"{f} row{i}: got {g}, want NaN"
            else:
                assert np.isclose(g, e, rtol=1e-9, atol=1e-12), f"{f} row{i}: got {g}, want {e}"


def test_golden_phantom():
    got = _kernel_rows([PHANTOM])
    assert got["COUNT"][0] == 25
    assert got["MIN"][0] == 1 and got["MAX"][0] == 5 and got["RANGE"][0] == 4
    assert np.isclose(got["MEAN"][0], sum(PHANTOM) / 25)
    assert got["MEDIAN"][0] == 2
    assert got["MODE"][0] == 1  # 1 occurs 9 times
    assert np.isclose(got["ENERGY"][0], sum(x * x for x in PHANTOM))
    assert np.isclose(got["INTEGRATED_INTENSITY"][0], 60.0)


def test_blank_and_empty_paths():
    got = _kernel_rows([[5, 5, 5], []])
    # blank: MEAN=MEDIAN=MIN=MAX=min, RANGE=0, rest NaN (intensity.cpp:60-96)
    assert got["MEAN"][0] == 5 and got["MEDIAN"][0] == 5 and got["RANGE"][0] == 0
    assert math.isnan(got["ENTROPY"][0]) and math.isnan(got["VARIANCE"][0])
    assert got["COUNT"][1] == 0 and math.isnan(got["MEAN"][1])


def test_spark_extract_matches_oracle(spark, sf_dir):
    from nyxus_spark.features import extract_features
    from nyxus_spark.sources import tokens_versions

    df = tokens_versions(spark, sf_dir)
    out = extract_features(df, ["*ALL_INTENSITY*"]).toPandas()
    assert len(out) > 0
    # spot-check every row against the scalar oracle
    for _, row in out.sample(n=min(len(out), 60), random_state=0).iterrows():
        exp = ref_firstorder(list(row["tokens"]), n_bins=SET.n_bins)
        for f in ("MEAN", "MEDIAN", "MODE", "P10", "P99", "ENTROPY", "UNIFORMITY",
                  "SKEWNESS", "KURTOSIS", "ROBUST_MEAN_ABSOLUTE_DEVIATION"):
            e, g = exp[f], row[f]
            if isinstance(e, float) and math.isnan(e):
                assert math.isnan(g)
            else:
                assert np.isclose(g, e, rtol=1e-9), f"{f}: {g} != {e}"


def test_tokens_table_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from nyxus_spark.sources import tokens_static, tokens_versions

    for df in (tokens_static(spark, sf_dir), tokens_versions(spark, sf_dir)):
        bad = df.filter(F.size("tokens") != F.col("n_tok")).count()
        assert bad == 0
        rng = df.select(
            F.min(F.array_min("tokens")).alias("lo"), F.max(F.array_max("tokens")).alias("hi")
        ).first()
        assert rng["lo"] >= 0 and rng["hi"] < 50257
