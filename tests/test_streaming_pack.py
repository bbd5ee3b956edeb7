"""Streaming sequence packing (applyInPandasWithState) vs the batch packer.

The corpus is split into two ID-RANGED files and driven with
maxFilesPerTrigger=1: every shard's documents arrive in id order across the
two micro-batches, so the per-shard offset carried in GroupState must make
the streaming assignment IDENTICAL to the batch pack_sequences output —
and the second batch's offsets can only be right via the state carry."""

import os

import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators.packing import pack_sequences, shard_expr
from nyxus_spark.streaming import pack_stream
from nyxus_spark.streaming.pack import PACK_IN_SCHEMA


def _docs(spark, sf_dir):
    from nyxus_spark.sources import tokens_static

    t = tokens_static(spark, sf_dir).filter(F.col("n_tok") > 0)
    oid = F.expr("cast(substr(doc_id, 5) as bigint)")
    return t.select(
        shard_expr(oid, 4).alias("pack_shard"),
        "doc_id",
        oid.alias("oid"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )


def test_stream_pack_matches_batch(spark, sf_dir, tmp_path):
    tagged = _docs(spark, sf_dir).cache()
    split_oid = tagged.approxQuantile("oid", [0.5], 0.0)[0]

    stream_dir = tmp_path / "pack_stream"
    stream_dir.mkdir()
    tagged.filter(F.col("oid") <= split_oid).toPandas().to_parquet(
        stream_dir / "part-000.parquet")
    tagged.filter(F.col("oid") > split_oid).toPandas().to_parquet(
        stream_dir / "part-001.parquet")
    os.utime(stream_dir / "part-000.parquet", (1_000_000, 1_000_000))
    os.utime(stream_dir / "part-001.parquet", (2_000_000, 2_000_000))

    src = (
        spark.readStream.schema(PACK_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        pack_stream(src, capacity=128)
        .writeStream.format("memory")
        .queryName("pack_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM pack_stream_out").toPandas()
    # both micro-batches ran → the offset carry was actually exercised
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 2

    from nyxus_spark.sources import tokens_static

    exp = pack_sequences(
        tokens_static(spark, sf_dir).filter(F.col("n_tok") > 0),
        capacity=128,
        id_expr=F.expr("cast(substr(doc_id, 5) as bigint)"),
        n_shards=4,
    ).select("doc_id", "pack_shard", "pack_start", "pack_first",
             "pack_last", "pack_spans", "pack_head_fill").toPandas()

    g = got.sort_values("doc_id").reset_index(drop=True)
    e = exp.sort_values("doc_id").reset_index(drop=True)
    assert len(g) == len(e) > 0
    for col in e.columns:
        assert (g[col].to_numpy() == e[col].to_numpy()).all(), col
    tagged.unpersist()


def test_stream_pack_validation(spark):
    df = spark.createDataFrame([], PACK_IN_SCHEMA)
    with pytest.raises(ValueError):
        pack_stream(df, capacity=0)
