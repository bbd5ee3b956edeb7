"""Edge cases for the pipeline functions added in round 3."""

import pytest
from pyspark.sql import functions as F

from nyxus_spark.functions import chunk_tokens, deterministic_sample, vocab_topk


def test_chunk_validation():
    with pytest.raises(ValueError, match="size > 0"):
        chunk_tokens(None, 0)
    with pytest.raises(ValueError, match="size > 0"):
        chunk_tokens(None, 8, overlap=8)
    with pytest.raises(ValueError, match="size > 0"):
        chunk_tokens(None, 8, overlap=-1)


def test_sample_validation():
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(None, 1.5, None)


def test_chunk_shapes(spark):
    df = spark.createDataFrame(
        [("a", list(range(10)), 10), ("b", [7], 1), ("c", [], 0)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    out = chunk_tokens(df, size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc a: starts 0,3,6,9 → lens 4,4,4,1
    a = sorted(by_doc["a"], key=lambda r: r["chunk_id"])
    assert [r["chunk_len"] for r in a] == [4, 4, 4, 1]
    assert a[1]["chunk_tokens"] == [3, 4, 5, 6]  # overlap of 1 with chunk 0
    assert [r["chunk_len"] for r in by_doc["b"]] == [1]
    assert "c" not in by_doc  # zero tokens → no chunks (sequence guard)


def test_sample_stability_and_rate(spark):
    df = spark.range(10000).withColumnRenamed("id", "k")
    s1 = deterministic_sample(df, 0.3, F.col("k")).collect()
    s2 = deterministic_sample(df.repartition(7), 0.3, F.col("k")).collect()
    assert sorted(r["k"] for r in s1) == sorted(r["k"] for r in s2)
    assert 0.25 < len(s1) / 10000 < 0.35
    assert deterministic_sample(df, 0.0, F.col("k")).count() == 0


def test_vocab_topk_order(spark):
    df = spark.createDataFrame(
        [([1, 1, 2],), ([2, 3],), ([2],)], "tokens array<int>"
    )
    rows = vocab_topk(df, k=2).collect()
    assert [(r["token"], r["cnt"]) for r in rows] == [(2, 3), (1, 2)]
