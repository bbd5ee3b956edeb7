"""write_training_order: range-partitioned global epoch permutation.

A sequential reader over the files in name order must see the exact
reproducible permutation the epoch-shuffle key defines — files are range
partitions (every key in file i < every key in file i+1) and each file is
internally sorted."""

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyxus_spark.functions import epoch_shuffle_key
from nyxus_spark.sinks import write_training_order


def test_global_order_materialized(spark, tmp_path):
    df = spark.range(2000).select(F.col("id"))
    out = str(tmp_path / "epoch0")
    write_training_order(df, out, epoch=0, id_expr=F.col("id"), n_files=8)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1  # actually range-partitioned, not one blob
    seen = []
    prev_max = None
    for f in files:
        pdf = pd.read_parquet(f)
        keys = pdf["__order_key"].to_list()
        assert keys == sorted(keys), f  # sorted within the file
        if keys:
            if prev_max is not None:
                assert keys[0] >= prev_max  # file ranges don't overlap
            prev_max = keys[-1]
            seen.extend(pdf["id"].to_list())
    assert len(seen) == 2000 and len(set(seen)) == 2000

    # the materialized order IS the epoch-0 permutation, re-derivable
    exp = (spark.range(2000)
           .select("id", epoch_shuffle_key(F.col("id"), 0).alias("k"))
           .orderBy("k").select("id").toPandas()["id"].to_list())
    assert seen == exp


def test_epochs_differ_on_disk(spark, tmp_path):
    df = spark.range(300).select(F.col("id"))
    orders = []
    for e in (0, 1):
        out = str(tmp_path / f"e{e}")
        write_training_order(df, out, epoch=e, id_expr=F.col("id"), n_files=4)
        ids = []
        for f in sorted(glob.glob(f"{out}/part-*.parquet")):
            ids.extend(pd.read_parquet(f)["id"].to_list())
        orders.append(ids)
    assert sorted(orders[0]) == sorted(orders[1])
    assert orders[0] != orders[1]
