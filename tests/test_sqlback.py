"""Catalyst-native firstorder backend: BIT-exact parity with the Arrow
kernel (features/sqlback.py vs features/compute.py) — real corpus rows plus
the blank/empty/short edge paths of intensity.cpp:60-96."""

import math

import pytest
from pyspark.sql import functions as F

from nyxus_spark.features import extract_features
from nyxus_spark.features.sqlback import (
    SQL_FIRSTORDER_FEATURES,
    SQL_IH_FEATURES,
    extract_features_sql,
)

SF = "/root/testdata/sf0.001"


def _cmp(a, b, name, doc):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return
        assert a == b, f"{name} mismatch on {doc}: kernel={a!r} sql={b!r}"
    else:
        assert a == b, f"{name} mismatch on {doc}: kernel={a!r} sql={b!r}"


def _assert_parity(df):
    k = {r.doc_id: r for r in
         extract_features(df, SQL_FIRSTORDER_FEATURES,
                          keep_tokens=False).collect()}
    s = {r.doc_id: r for r in
         extract_features_sql(df, SQL_FIRSTORDER_FEATURES).collect()}
    assert set(k) == set(s)
    for doc in k:
        for name in SQL_FIRSTORDER_FEATURES:
            _cmp(float(k[doc][name]), float(s[doc][name]), name, doc)


def test_sql_backend_matches_kernel_on_corpus(spark):
    from nyxus_spark.sources import tokens_static

    df = tokens_static(spark, SF).select("doc_id", "tokens", "n_tok")
    _assert_parity(df)


def test_sql_backend_matches_kernel_on_edges(spark):
    rows = [
        ("empty", [], 0),
        ("blank", [7, 7, 7, 7], 4),      # min == max: the blank-ROI path
        ("single", [9], 1),               # pop 1: var/skew guards
        ("pair", [3, 9], 2),              # pop 2: even median, pop>3 guards
        ("skewed", [1, 1, 1, 1, 50], 5),
        ("zeros", [0, 0, 0], 3),          # blank at value 0 (PIU edge)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "tokens", "n_tok"]).withColumn(
        "tokens", F.col("tokens").cast("array<int>"))
    _assert_parity(df)


def _assert_ih_parity(df):
    k = {r.doc_id: r for r in
         extract_features(df, SQL_IH_FEATURES, keep_tokens=False).collect()}
    s = {r.doc_id: r for r in
         extract_features_sql(df, SQL_IH_FEATURES).collect()}
    assert set(k) == set(s)
    for doc in k:
        for name in SQL_IH_FEATURES:
            _cmp(float(k[doc][name]), float(s[doc][name]), name, doc)


def test_sql_backend_ih_matches_kernel_on_corpus(spark):
    from nyxus_spark.sources import tokens_static

    df = tokens_static(spark, SF).select("doc_id", "tokens", "n_tok")
    _assert_ih_parity(df)


def test_sql_backend_ih_matches_kernel_on_edges(spark):
    rows = [
        ("empty", [], 0),
        ("blank", [7, 7, 7, 7], 4),       # rng 0 -> softNAN everywhere
        ("single", [9], 1),
        ("pair", [3, 9], 2),              # 2 present bins, quantile walks
        ("skewed", [1, 1, 1, 1, 50], 5),  # heavy mode bin, top-walk stop
        ("dense", list(range(200)) * 2, 400),  # every bin present
        ("sparse_hi", [0, 250], 2),       # extreme bins only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "tokens", "n_tok"]).withColumn(
        "tokens", F.col("tokens").cast("array<int>"))
    _assert_ih_parity(df)


def test_sql_backend_ih_plan_is_python_free(spark):
    from nyxus_spark.sources import tokens_static

    df = extract_features_sql(
        tokens_static(spark, SF).select("doc_id", "tokens", "n_tok"),
        SQL_IH_FEATURES)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan


def test_sql_backend_mixed_families(spark):
    # one call spanning firstorder + IH stages both pipelines
    feats = ["MEAN", "VARIANCE", "IH_MEAN_VAL", "IH_MODE_IDX"]
    df = spark.createDataFrame(
        [("d0", [1, 5, 9, 9], 4), ("d1", [], 0)],
        ["doc_id", "tokens", "n_tok"]).withColumn(
        "tokens", F.col("tokens").cast("array<int>"))
    k = {r.doc_id: r for r in
         extract_features(df, feats, keep_tokens=False).collect()}
    s = {r.doc_id: r for r in extract_features_sql(df, feats).collect()}
    for d in k:
        for c in feats:
            _cmp(float(k[d][c]), float(s[d][c]), c, d)


def test_sql_backend_rejects_non_expressible(spark):
    df = spark.createDataFrame([("d", [1, 2], 2)],
                               ["doc_id", "tokens", "n_tok"])
    with pytest.raises(ValueError):
        extract_features_sql(df, ["ENTROPY"])


def test_sql_backend_plan_is_python_free(spark):
    from nyxus_spark.sources import tokens_static

    df = extract_features_sql(
        tokens_static(spark, SF).select("doc_id", "tokens", "n_tok"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan  # narrow: projection over the scan


def test_api_sql_backend(spark):
    from nyxus_spark.api import NyxusSpark

    nx = NyxusSpark(features=["MEAN", "VARIANCE", "MEDIAN"])
    df = spark.createDataFrame(
        [("d0", [1, 2, 3, 4], 4), ("d1", [9, 9, 2], 3)],
        ["doc_id", "tokens", "n_tok"])
    k = {r.doc_id: r for r in nx.featurize(df).collect()}
    s = {r.doc_id: r for r in nx.featurize(df, backend="sql").collect()}
    for d in k:
        for c in ("MEAN", "VARIANCE", "MEDIAN"):
            assert float(k[d][c]) == float(s[d][c])
    with pytest.raises(ValueError):
        nx.featurize(df, backend="sql", annotations=["doc_id"])
    with pytest.raises(ValueError):
        NyxusSpark(features=["ENTROPY"]).featurize(df, backend="sql")
    with pytest.raises(ValueError):
        nx.featurize(df, backend="vulkan")


def test_sql_backend_is_streaming_safe(spark, tmp_path):
    """The operational claim behind backend='sql': pure column expressions
    compose into Structured Streaming with NO stateful operator and NO
    Python workers — the streamed result must equal the batch result
    row-for-row (the kernel path needs mapInArrow; this path is plain
    projections, so it rides any source/sink unchanged)."""
    import os

    from nyxus_spark.sources import tokens_static

    feats = ["MEAN", "VARIANCE", "MEDIAN", "P75", "UNIFORMITY"]
    batch = tokens_static(spark, SF).select("doc_id", "tokens", "n_tok")
    sdir = str(tmp_path / "stream_src")
    os.makedirs(sdir)
    batch.limit(40).write.parquet(sdir, mode="overwrite")
    src = spark.readStream.schema(batch.schema).parquet(sdir)
    q = (
        extract_features_sql(src, feats)
        .writeStream.format("memory").queryName("sqlback_stream_gate")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.doc_id: r for r in
           spark.sql("SELECT * FROM sqlback_stream_gate").collect()}
    exp = {r.doc_id: r for r in extract_features_sql(
        spark.read.parquet(sdir), feats).collect()}
    assert set(got) == set(exp) and len(got) == 40
    for d in exp:
        for c in feats:
            a, b = float(got[d][c]), float(exp[d][c])
            assert (a == b) or (math.isnan(a) and math.isnan(b))
