"""remap_tokens: rare-token → UNK vocabulary control."""

import pytest
from pyspark.sql import functions as F

from nyxus_spark.functions import remap_tokens


def test_remap_basic(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3, 4, 2]), ("b", [5, 1, 1])], "doc_id string, tokens array<int>")
    got = {r.doc_id: r.tokens for r in
           remap_tokens(df, keep=[1, 2], unk=-1).collect()}
    assert got["a"] == [1, 2, -1, -1, 2]
    assert got["b"] == [-1, 1, 1]


def test_remap_out_col_and_validation(spark):
    df = spark.createDataFrame([("a", [7])], "doc_id string, tokens array<int>")
    out = remap_tokens(df, keep=[7], unk=0, out_col="t2").collect()[0]
    assert out.tokens == [7] and out.t2 == [7]
    with pytest.raises(ValueError):
        remap_tokens(df, keep=[], unk=0)
