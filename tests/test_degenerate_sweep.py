"""Degenerate-input sweep: every kernel section and array-expression operator
against pathological inputs (three short-array bugs were found by ad-hoc
probing in round 1 — this makes the class systematic)."""

import math

import numpy as np
import pytest

from nyxus_spark.features.registry import all_sections
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings

PATHOLOGICAL = [
    [],                      # empty
    [0],                     # single background token
    [7],                     # single token
    [0, 0, 0, 0],            # all background
    [50256],                 # max vocab id
    [50256] * 3,             # constant at max
    [0, 50256],              # extremes
    list(range(4096)),       # max-length ramp
    [1] * 4096,              # max-length constant
    [0, 1] * 2048,           # max-length alternating with background
]


@pytest.mark.parametrize("grey", [-64, 64, 0])
def test_all_sections_survive_pathological(grey):
    s = FeatureSettings(grey_info=grey)
    cases = PATHOLOGICAL
    if grey == 0:
        # IBSI identity binning deliberately refuses huge grey ranges
        # (texture.py guard); sweep it with a small-vocab variant instead
        cases = [[min(x, 200) for x in c] for c in PATHOLOGICAL]
    seg = Segments([np.array(c, dtype=np.int64) for c in cases])
    for name, sec in all_sections().items():
        out = sec.fn(seg, s)
        for f, arr in out.items():
            assert len(arr) == len(cases), (name, f)
            assert np.all(np.isfinite(arr) | np.isnan(arr)), (name, f)


def test_ibsi_guard_raises_on_huge_vocab():
    from nyxus_spark.features.texture import glcm_section

    seg = Segments([np.array([1, 50256], dtype=np.int64)])
    with pytest.raises(ValueError, match="IBSI identity binning"):
        glcm_section(seg, FeatureSettings(grey_info=0))


def test_sections_row_independent():
    """A row's features must not depend on its batch neighbors."""
    s = FeatureSettings()
    rng = np.random.RandomState(5)
    rows = [rng.randint(0, 251, size=rng.randint(1, 60)) for _ in range(40)]
    full = {name: sec.fn(Segments([np.array(r) for r in rows]), s)
            for name, sec in all_sections().items()}
    # same rows, shuffled into two different batches
    for name, sec in all_sections().items():
        solo = sec.fn(Segments([np.array(rows[17])]), s)
        for f, arr in full[name].items():
            a, b = arr[17], solo[f][0]
            assert (math.isnan(a) and math.isnan(b)) or np.isclose(a, b, rtol=1e-12, equal_nan=True), (name, f)


def test_spark_null_and_empty_token_cells(spark):
    """Null / empty token arrays through the real Spark surface."""
    from nyxus_spark.features import extract_features

    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", []), ("c", None)],
        "doc_id string, tokens array<int>",
    )
    out = extract_features(df, ["MEAN", "COUNT", "GLCM_CONTRAST"], keep_tokens=False).toPandas()
    out = out.set_index("doc_id")
    assert out.loc["a", "COUNT"] == 3
    assert out.loc["b", "COUNT"] == 0 and math.isnan(out.loc["b", "MEAN"])
    assert out.loc["c", "COUNT"] == 0 and math.isnan(out.loc["c", "MEAN"])


def test_operator_exprs_on_degenerate_arrays(spark):
    from pyspark.sql import functions as F

    from nyxus_spark.functions import fingerprint_expr
    from nyxus_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs, token_shingles

    df = spark.createDataFrame(
        [("a", []), ("b", [5]), ("c", [5, 6]), ("d", [5, 6, 7]), ("e", None)],
        "doc_id string, tokens array<int>",
    )
    sh = df.select("doc_id", token_shingles().alias("s")).toPandas().set_index("doc_id")
    assert len(sh.loc["a", "s"]) == 0 and len(sh.loc["d", "s"]) == 1
    assert minhash_lsh_pairs(df.filter(F.col("tokens").isNotNull())).count() == 0
    assert simhash_pairs(df.filter(F.col("tokens").isNotNull())).count() == 0
    fp = df.filter(F.col("tokens").isNotNull()).select(fingerprint_expr().alias("f")).collect()
    assert all(r["f"] is not None for r in fp)


def test_from_flat_equals_list_construction():
    """Segments.from_flat (the Arrow zero-copy path) must be indistinguishable
    from list-of-arrays construction for every kernel section, including over
    pathological inputs."""
    rows = [np.array(c, dtype=np.int64) for c in PATHOLOGICAL]
    a = Segments(rows)
    flat = np.concatenate([r for r in rows if r.size]) if any(r.size for r in rows) \
        else np.empty(0, np.int64)
    lengths = np.array([r.size for r in rows], dtype=np.int64)
    b = Segments.from_flat(flat, lengths)
    np.testing.assert_array_equal(a.flat, b.flat)
    np.testing.assert_array_equal(a.lengths, b.lengths)
    np.testing.assert_array_equal(a.starts, b.starts)
    np.testing.assert_array_equal(a.row_idx, b.row_idx)
    s = FeatureSettings()
    for sec in all_sections().values():
        va, vb = sec.fn(a, s), sec.fn(b, s)
        for k in va:
            np.testing.assert_array_equal(va[k], vb[k], err_msg=f"{sec.name}:{k}")
