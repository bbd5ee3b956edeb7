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
        [("a", list(range(10)), 10), ("b", [7], 1), ("c", [], 0),
         ("d", list(range(11)), 11)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    out = chunk_tokens(df, size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc a: last start capped at n_tok-overlap-1 = 8 → starts 0,3,6 (a start
    # at 9 would emit [token 9], fully covered by the start-6 window — the
    # duplicated-training-data case the cap removes)
    a = sorted(by_doc["a"], key=lambda r: r["chunk_id"])
    assert [r["chunk_len"] for r in a] == [4, 4, 4]
    assert a[1]["chunk_tokens"] == [3, 4, 5, 6]  # overlap of 1 with chunk 0
    assert a[2]["chunk_tokens"] == [6, 7, 8, 9]  # full coverage retained
    # doc d (n_tok=11): the start-9 window DOES extend coverage (token 10)
    d = sorted(by_doc["d"], key=lambda r: r["chunk_id"])
    assert [r["chunk_len"] for r in d] == [4, 4, 4, 2]
    assert d[3]["chunk_tokens"] == [9, 10]
    assert [r["chunk_len"] for r in by_doc["b"]] == [1]
    assert "c" not in by_doc  # zero tokens → no chunks (sequence guard)


def test_chunk_no_contained_duplicates(spark):
    # property: with overlap > 0, no chunk may be a suffix-contained
    # duplicate of the previous chunk (every chunk ends strictly later)
    import itertools
    for size, overlap, n in itertools.product((4, 8), (0, 1, 3), range(1, 20)):
        if overlap >= size:
            continue
        df = spark.createDataFrame(
            [("x", list(range(n)), n)], "doc_id string, tokens array<int>, n_tok int"
        )
        rows = sorted(
            chunk_tokens(df, size=size, overlap=overlap).collect(),
            key=lambda r: r["chunk_id"],
        )
        ends = [r["chunk_tokens"][-1] for r in rows]
        assert ends[-1] == n - 1, (size, overlap, n)  # full coverage
        assert all(b > a for a, b in zip(ends, ends[1:])), (size, overlap, n)


def test_sample_negative_and_large_ids(spark):
    # negative ids and ids past the bigint-overflow point of id*MIX must
    # hash into [0, P31) — rate stays ~honest instead of silently inflating
    df = spark.range(-5000, 5000).withColumnRenamed("id", "k")
    n = deterministic_sample(df, 0.2, F.col("k")).count()
    assert 0.15 < n / 10000 < 0.25
    big = spark.range(4_000_000_000, 4_000_010_000).withColumnRenamed("id", "k")
    nb = deterministic_sample(big, 0.2, F.col("k")).count()
    assert 0.15 < nb / 10000 < 0.25


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


def test_stratified_validation():
    from nyxus_spark.functions import stratified_keep, stratified_sample

    with pytest.raises(ValueError, match="rate for"):
        stratified_keep({"a": 1.5}, "s", None)
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(None, {"a": 0.5}, "s", None, default_rate=-0.1)


def test_stratified_rates_and_nesting(spark):
    """Per-stratum rates hold; samples at a lower rate are SUBSETS of the
    same stratum's higher-rate sample (shared hash order); unlisted strata
    fall back to default_rate; results are partitioning-independent."""
    from pyspark.sql import functions as F

    from nyxus_spark.functions import stratified_sample

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"),
    )
    lo = stratified_sample(df, {"s0": 0.25, "s1": 0.1}, "src", F.col("k"))
    hi = stratified_sample(df, {"s0": 0.75, "s1": 0.1}, "src", F.col("k"))
    lo_ids = {r["k"] for r in lo.collect()}
    hi_ids = {r["k"] for r in hi.collect()}
    # nested: every low-rate row survives at the higher rate
    assert lo_ids <= hi_ids
    # per-stratum counts near their rates (1000 rows each)
    per = {r["src"]: r["n"] for r in
           hi.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert abs(per["s0"] - 750) < 100 and abs(per["s1"] - 100) < 50
    assert "s2" not in per and "s3" not in per  # default_rate=0 drops them
    # default_rate keeps unlisted strata
    d = stratified_sample(df, {"s0": 0.0}, "src", F.col("k"), default_rate=1.0)
    dn = {r["src"]: r["n"] for r in
          d.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert "s0" not in dn and dn["s1"] == 1000 and dn["s3"] == 1000
    # partitioning-independent
    again = {r["k"] for r in
             stratified_sample(df.repartition(13), {"s0": 0.75, "s1": 0.1},
                               "src", F.col("k")).collect()}
    assert again == hi_ids
