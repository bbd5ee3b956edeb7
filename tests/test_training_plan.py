"""End-to-end training-data PLAN composition: deterministic sample →
holdout filter → per-source rank → stride-scheduling interleave key →
exact range bounds → materialized global order. Each stage is gated
individually elsewhere; this pins that they COMPOSE (the artifact a user
actually ships)."""
import glob

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from nyxus_spark.functions import (
    deterministic_sample,
    epoch_shuffle_key,
    holdout_split,
    stride_interleave_key,
)
from nyxus_spark.operators.prescan import exact_range_bounds
from nyxus_spark.sinks import write_training_order


def test_training_plan_composes(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, ["srcA", "srcB", "srcC"][i % 3]) for i in range(600)],
        ["doc_id", "source"])
    # 1. reproducible subsample, 2. drop eval holdout from training
    plan = deterministic_sample(docs, 0.8, F.col("doc_id"))
    plan = plan.withColumn(
        "holdout", holdout_split(F.col("doc_id"), 0.1, 0.1))
    train = plan.filter(F.col("holdout") == 0)
    # 3. per-source deterministic rank, 4. weight-exact interleave key
    w = Window.partitionBy("source").orderBy(
        epoch_shuffle_key(F.col("doc_id"), 0).asc(), F.col("doc_id").asc())
    train = train.withColumn("rank", F.row_number().over(w))
    train = train.withColumn(
        "mix_key", stride_interleave_key(F.col("rank"), {"srcA": 2}))
    # 5. exact range bounds over the mix key (ties exist across sources)
    bounds = {r.bound_idx: r.bound_val
              for r in exact_range_bounds(train, "mix_key", 4).collect()}
    assert len(bounds) == 3 and sorted(bounds.values()) == list(bounds.values())
    # 6. materialize the global order (range partition + in-file sort)
    out = str(tmp_path / "epoch0")
    write_training_order(train, out, epoch=0, id_expr=F.col("doc_id"),
                         n_files=4)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    seen = []
    prev_max = None
    for f in files:
        pdf = pd.read_parquet(f)
        keys = pdf["__order_key"].tolist()
        assert keys == sorted(keys)           # in-file sorted
        if prev_max is not None and keys:
            assert keys[0] >= prev_max        # files globally ordered
        if keys:
            prev_max = keys[-1]
        seen.extend(pdf["doc_id"].tolist())
    # exactly the training rows, each once
    expected = {r.doc_id for r in train.collect()}
    assert sorted(seen) == sorted(expected)
    assert len(seen) == len(expected)
    # no holdout leakage into the materialized order
    holdouts = {r.doc_id for r in plan.filter(F.col("holdout") > 0).collect()}
    assert not holdouts.intersection(seen)
