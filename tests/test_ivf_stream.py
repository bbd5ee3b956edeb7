"""Streaming IVF index maintenance: appended vectors become searchable."""
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from nyxus_spark.operators.similarity import (
    ivf_index,
    ivf_index_stream,
    ivf_search,
)

VEC_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _vec(seed, dim=8):
    # distinct for every seed below 97 apart (avoids accidental ties)
    return [float((seed * (j + 3)) % 97 - 48) for j in range(dim)]


def test_streamed_vectors_become_searchable(spark, tmp_path):
    idx = str(tmp_path / "idx")
    sdir = str(tmp_path / "stream_in")
    os.makedirs(sdir)
    cents = spark.createDataFrame(
        [(0, _vec(2)), (1, _vec(11))], ["cent_id", "cent_vec"])
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20, 30)], VEC_SCHEMA)
    ivf_index(base, cents, idx)
    # query identical to a vector that arrives ONLY via the stream
    q = _vec(101)
    before = ivf_search(spark, idx, cents, q, k=1, n_probe=2).collect()
    new = spark.createDataFrame(
        [(100 + i, _vec(100 + i)) for i in range(4)], VEC_SCHEMA)
    f0 = os.path.join(sdir, "b0.parquet")
    new.toPandas().to_parquet(f0)
    src = spark.readStream.schema(VEC_SCHEMA).parquet(sdir)
    qy = ivf_index_stream(src, cents, idx,
                          checkpoint=str(tmp_path / "ckpt"))
    qy.awaitTermination()
    after = ivf_search(spark, idx, cents, q, k=1, n_probe=2).collect()
    assert after[0].vec_id == 101
    assert after[0].cos == 1.0
    # the pre-stream result was some other vector (or a weaker match)
    assert before[0].vec_id != 101
    # base vectors still present alongside the appended batch
    total = spark.read.parquet(idx).count()
    assert total == 14


def test_compact_merges_files_and_preserves_search(spark, tmp_path):
    from nyxus_spark.operators.similarity import ivf_index_compact
    idx = str(tmp_path / "idx")
    sdir = str(tmp_path / "stream_in")
    os.makedirs(sdir)
    cents = spark.createDataFrame(
        [(0, _vec(2)), (1, _vec(11))], ["cent_id", "cent_vec"])
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20, 30)], VEC_SCHEMA)
    ivf_index(base, cents, idx)
    # two streamed batches -> multiple files per bucket
    for j in (0, 1):
        spark.createDataFrame(
            [(200 + 10 * j + i, _vec(200 + 10 * j + i)) for i in range(3)],
            VEC_SCHEMA,
        ).toPandas().to_parquet(os.path.join(sdir, f"b{j}.parquet"))
    qy = ivf_index_stream(
        spark.readStream.schema(VEC_SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(sdir),
        cents, idx, checkpoint=str(tmp_path / "ckpt2"))
    qy.awaitTermination()
    import glob as _g
    def _files():
        return [f for f in _g.glob(idx + "/assigned_cent=*/part-*.parquet")]
    before_rows = spark.read.parquet(idx).orderBy("vec_id").collect()
    assert len(_files()) > 2  # appends accumulated multiple files
    q = _vec(201)
    before = ivf_search(spark, idx, cents, q, k=1, n_probe=2).collect()
    ivf_index_compact(spark, idx)
    files = _files()
    # one file per bucket
    buckets = {f.split("assigned_cent=")[1].split("/")[0] for f in files}
    assert len(files) == len(buckets)
    after_rows = spark.read.parquet(idx).orderBy("vec_id").collect()
    assert after_rows == before_rows
    after = ivf_search(spark, idx, cents, q, k=1, n_probe=2).collect()
    assert after == before
