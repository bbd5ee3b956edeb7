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


def test_bpe_merge_count_greedy(spark):
    """Greedy left-to-right non-overlap: aaa -> 1 merge, aaaa -> 2; a!=b
    occurrences can't overlap so plain counting applies."""
    from pyspark.sql import functions as F

    from nyxus_spark.functions import bpe_merge_count

    rows = [
        ("aaa", [7, 7, 7]),
        ("aaaa", [7, 7, 7, 7]),
        ("aabaa", [7, 7, 9, 7, 7]),
        ("abab", [7, 9, 7, 9]),
        ("single", [7]),
        ("none", [1, 2, 3]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>") \
        .withColumn("n_tok", F.size("tokens"))
    eq = {r.doc_id: r.m for r in
          df.select("doc_id", bpe_merge_count(7, 7).alias("m")).collect()}
    assert eq == {"aaa": 1, "aaaa": 2, "aabaa": 2, "abab": 0,
                  "single": 0, "none": 0}
    ne = {r.doc_id: r.m for r in
          df.select("doc_id", bpe_merge_count(7, 9).alias("m")).collect()}
    assert ne == {"aaa": 0, "aaaa": 0, "aabaa": 1, "abab": 2,
                  "single": 0, "none": 0}
