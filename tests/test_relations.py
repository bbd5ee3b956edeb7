"""Relation operators: neighbor range-join correctness vs brute force,
rollups, whitelist/blacklist/merge filters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators.prescan import covered_range_col, source_ranges, with_source_range
from nyxus_spark.operators.relations import (
    filter_blacklist, filter_whitelist, merge_labels, neighbor_pairs, rollup_parent,
)


def test_neighbor_pairs_equals_bruteforce(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("doc_id"), "ts", "event_id"
    )
    R = 7200.0
    got = neighbor_pairs(ev, R).select("event_id_a", "event_id_b").toPandas()
    gs = set(map(tuple, got.values.tolist()))
    a, b = ev.alias("a"), ev.alias("b")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    brute = (
        a.join(b, "doc_id")
        .filter(F.col("a.event_id") < F.col("b.event_id"))
        .filter(F.abs(us("a.ts") - us("b.ts")) <= int(R * 1e6))
        .select(F.col("a.event_id").alias("x"), F.col("b.event_id").alias("y"))
        .toPandas()
    )
    bs = set(map(tuple, brute.values.tolist()))
    assert gs == bs, f"bucketed range join != brute force ({len(gs ^ bs)} diff)"


def test_rollup_parent_basic(spark):
    child = spark.createDataFrame(
        [("p1", 2, 1.5), ("p1", 4, 2.5), ("p2", 10, 0.5)], "pk string, a int, v double"
    )
    out = {r["pk"]: r for r in rollup_parent(child, "pk", ["a", "v"]).collect()}
    assert out["p1"]["n_children"] == 2
    assert out["p1"]["sum_a"] == 6.0 and out["p1"]["mean_a"] == 3.0
    assert out["p1"]["max_v"] == 2.5 and out["p2"]["min_v"] == 0.5


def test_filters_and_merge(spark, sf_dir):
    from nyxus_spark.sources import tokens_static

    t = tokens_static(spark, sf_dir)
    wl = filter_whitelist(t, ["doc_1", "doc_2"])
    assert wl.count() == 2
    ids = spark.createDataFrame([("doc_1",), ("doc_2",)], "doc_id string")
    assert filter_whitelist(t, ids).count() == 2
    n = t.count()
    assert filter_blacklist(t, ids).count() == n - 2
    merged = merge_labels(t)
    assert merged.select("doc_id").distinct().count() == 1


def test_prescan_broadcast_plan_and_values(spark, sf_dir):
    from nyxus_spark.sources import tokens_static

    t = tokens_static(spark, sf_dir)
    dim = source_ranges(t).toPandas()
    assert (dim["src_max"] >= dim["src_min"]).all()
    joined = with_source_range(t)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, "prescan dim should broadcast-join"
    row = joined.select("doc_id", "tokens", "src_min", "src_max").first()
    assert min(row["tokens"]) >= row["src_min"] and max(row["tokens"]) <= row["src_max"]
    cr = joined.select(covered_range_col()).first()[0]
    assert 0.0 <= cr <= 1.0


def test_rollup_wma(spark):
    from pyspark.sql import functions as F

    from nyxus_spark.operators.relations import rollup_parent

    child = spark.createDataFrame(
        [("p1", 10, 2.0), ("p1", 30, 4.0), ("p2", 5, 7.0)],
        "doc_id string, n_tok int, value double",
    )
    out = {r.doc_id: r for r in rollup_parent(
        child, "doc_id", ["value"], aggs=["mean", "wma"], weight_col="n_tok"
    ).collect()}
    # p1: plain mean 3.0; area-weighted (10*2 + 30*4)/40 = 3.5
    assert out["p1"].mean_value == 3.0 and out["p1"].wma_value == 3.5
    assert out["p2"].wma_value == 7.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="weight_col"):
        rollup_parent(child, "doc_id", ["value"], aggs=["wma"])
