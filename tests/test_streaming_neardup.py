"""Streaming MinHash-LSH near-dup: cross-batch band state == batch LSH."""
import os

import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators.dedup import lsh_band_rows, minhash_candidate_pairs
from nyxus_spark.streaming.neardup import (
    NEARDUP_IN_SCHEMA,
    neardup_stream,
)


def _corpus(spark):
    base = list(range(100, 160))
    rows = []
    for i in range(24):
        toks = [(t + i) % 251 for t in base]
        if i % 6 == 0:  # near-dup cluster of the i=0 family
            toks = base[1:] + [i]
        rows.append((f"doc_{i:03d}", toks, len(toks)))
    return spark.createDataFrame(rows, ["doc_id", "tokens", "n_tok"])


def _run_stream(spark, banded, tmpdir, splits, name):
    files = []
    for j, part in enumerate(splits):
        f = os.path.join(tmpdir, f"part-{j:03d}.parquet")
        part.toPandas().to_parquet(f)
        os.utime(f, (1_000_000 * (j + 1), 1_000_000 * (j + 1)))
        files.append(f)
    src = (
        spark.readStream.schema(NEARDUP_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmpdir)
    )
    q = (
        neardup_stream(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in spark.sql(f"SELECT id_a, id_b FROM {name}").collect()
    }


def test_stream_equals_batch_candidates(spark, tmp_path):
    df = _corpus(spark)
    batch = {(r.id_a, r.id_b) for r in minhash_candidate_pairs(df).collect()}
    assert batch, "fixture must produce candidate pairs"
    banded = lsh_band_rows(df).select(
        F.col("band_idx").cast("int").alias("band_idx"),
        F.col("band_key").cast("long").alias("band_key"),
        "doc_id",
        F.expr("CAST(substring(doc_id, 5) AS BIGINT)").alias("oid"),
    )
    # split so at least one near-dup pair straddles the two micro-batches
    lo = banded.filter(F.col("oid") % 2 == 0)
    hi = banded.filter(F.col("oid") % 2 == 1)
    got = _run_stream(spark, banded, str(tmp_path), [lo, hi], "nd_parity")
    assert got == batch


def test_stream_detects_cross_batch_pair(spark, tmp_path):
    toks = list(range(100, 160))
    df = spark.createDataFrame(
        [("doc_0", toks, len(toks)), ("doc_1", toks[1:] + [7], len(toks))],
        ["doc_id", "tokens", "n_tok"])
    banded = lsh_band_rows(df).select(
        F.col("band_idx").cast("int").alias("band_idx"),
        F.col("band_key").cast("long").alias("band_key"),
        "doc_id",
        F.expr("CAST(substring(doc_id, 5) AS BIGINT)").alias("oid"),
    )
    lo = banded.filter(F.col("doc_id") == "doc_0")
    hi = banded.filter(F.col("doc_id") == "doc_1")
    got = _run_stream(spark, banded, str(tmp_path), [lo, hi], "nd_cross")
    # the pair exists ONLY across the two batches — state carry is the
    # only way to find it
    assert got == {("doc_0", "doc_1")}


def test_neardup_stream_validates(spark):
    from nyxus_spark.streaming.neardup import neardup_stream as nds
    with pytest.raises(ValueError):
        nds(None, max_bucket=0)
