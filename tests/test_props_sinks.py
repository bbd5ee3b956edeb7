"""Property-based kernel invariants (hypothesis) + sink round-trips."""

import math
import os
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nyxus_spark.features.firstorder import firstorder_section
from nyxus_spark.features.segmented import Segments
from nyxus_spark.features.texture import glrlm_section
from nyxus_spark.settings import FeatureSettings
from tests.oracle_firstorder import ref_firstorder

SET = FeatureSettings()

token_arrays = st.lists(
    st.lists(st.integers(min_value=0, max_value=50256), min_size=1, max_size=200),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(token_arrays)
def test_firstorder_invariants(cases):
    seg = Segments([np.array(c, dtype=np.int64) for c in cases])
    got = firstorder_section(seg, SET)
    for i, c in enumerate(cases):
        lo, hi, n = min(c), max(c), len(c)
        if hi == lo:
            assert got["MEAN"][i] == lo and got["RANGE"][i] == 0
            continue
        assert lo <= got["MEAN"][i] <= hi
        assert lo <= got["MEDIAN"][i] <= hi
        assert lo <= got["MODE"][i] <= hi
        assert got["P01"][i] <= got["P99"][i] + 1e-9
        assert 0 <= got["ENTROPY"][i] <= math.log2(SET.n_bins) + 1e-9
        assert 0 < got["UNIFORMITY"][i] <= 1 + 1e-12
        assert got["VARIANCE"][i] >= 0
        assert got["COUNT"][i] == n


@settings(max_examples=40, deadline=None)
@given(token_arrays)
def test_firstorder_matches_oracle_random(cases):
    seg = Segments([np.array(c, dtype=np.int64) for c in cases])
    got = firstorder_section(seg, SET)
    for i, c in enumerate(cases):
        exp = ref_firstorder(c, n_bins=SET.n_bins)
        for f in ("MEAN", "P10", "P90", "ENTROPY", "SKEWNESS", "MODE", "MEDIAN"):
            e, g = exp[f], got[f][i]
            if isinstance(e, float) and math.isnan(e):
                assert math.isnan(g)
            else:
                assert np.isclose(g, e, rtol=1e-9, atol=1e-12), (f, c)


@settings(max_examples=30, deadline=None)
@given(token_arrays)
def test_glrlm_invariants(cases):
    seg = Segments([np.array(c, dtype=np.int64) for c in cases])
    got = glrlm_section(seg, SET)
    for i, c in enumerate(cases):
        if min(c) == max(c):
            assert got["GLRLM_RP"][i] == 0.0  # degenerate path
            continue
        assert 0 < got["GLRLM_RP"][i] <= 1 + 1e-12
        assert got["GLRLM_SRE"][i] <= 1 + 1e-12  # 1/l² ≤ 1 per run
        assert got["GLRLM_LRE"][i] >= 1 - 1e-12


def test_sink_roundtrips(spark, sf_dir):
    from nyxus_spark import sinks
    from nyxus_spark.features import extract_features
    from nyxus_spark.sources import tokens_static

    df = extract_features(tokens_static(spark, sf_dir).limit(20), ["MEAN", "MIN"], keep_tokens=False)
    with tempfile.TemporaryDirectory() as d:
        sinks.to_parquet(df, f"{d}/p", partition_by=["source"])
        assert spark.read.parquet(f"{d}/p").count() == 20
        sinks.to_csv(df.drop("tokens") if "tokens" in df.columns else df, f"{d}/c")
        assert spark.read.option("header", "true").csv(f"{d}/c").count() == 20
        pdf = sinks.to_pandas(df)
        assert len(pdf) == 20 and "MEAN" in pdf
        sinks.to_arrow_ipc(df, f"{d}/f.arrow")
        import pyarrow.feather as feather

        assert feather.read_table(f"{d}/f.arrow").num_rows == 20
        sinks.to_json(df, f"{d}/j")
        sinks.to_orc(df, f"{d}/o", partition_by=["source"])
        from nyxus_spark.sources import load_path

        assert load_path(spark, f"{d}/j", "json").count() == 20
        assert load_path(spark, f"{d}/o", "orc").count() == 20
        with pytest.raises(ValueError, match="unknown source format"):
            load_path(spark, f"{d}/o", "avro")
    with pytest.raises(NotImplementedError, match="Iceberg catalog"):
        sinks.to_iceberg(df, "cat.db.t")
