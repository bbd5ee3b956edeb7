"""Streaming as-of join (applyInPandasWithState) vs the batch operator.

The tagged stream is split into two time-ordered files and driven with
maxFilesPerTrigger=1, so the second micro-batch's probes can only match
versions from the first batch through the GroupState carry — proving the
cross-batch state logic, not just single-batch merge_asof.
"""

import os

import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators import asof_join
from nyxus_spark.streaming import asof_join_stream


def _tagged_batch(spark, sf_dir):
    from nyxus_spark.sources import probes, tokens_versions

    v = tokens_versions(spark, sf_dir).select(
        "doc_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.lit(1).cast("long").alias("is_version"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.lit(None).cast("long").alias("event_id"),
    )
    p = probes(spark, sf_dir).select(
        "doc_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.lit(0).cast("long").alias("is_version"),
        F.lit(None).cast("long").alias("n_tok"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    return v.unionByName(p)


def test_stream_asof_matches_batch(spark, sf_dir, tmp_path):
    tagged = _tagged_batch(spark, sf_dir).cache()
    split_ts = tagged.approxQuantile("ts_us", [0.5], 0.0)[0]

    stream_dir = tmp_path / "tagged_stream"
    stream_dir.mkdir()
    # two time-ordered files → two micro-batches (ordering contract holds:
    # every file-1 row precedes every file-2 row in event time)
    def _dump(df, path):
        pdf = df.toPandas()
        for c in ("ts_us", "is_version", "n_tok", "event_id"):
            pdf[c] = pdf[c].astype("Int64")  # nullable int64, not float64
        pdf.to_parquet(path)

    _dump(tagged.filter(F.col("ts_us") <= split_ts), stream_dir / "part-000.parquet")
    _dump(tagged.filter(F.col("ts_us") > split_ts), stream_dir / "part-001.parquet")
    # file source orders by modification time — force it
    os.utime(stream_dir / "part-000.parquet", (1_000_000, 1_000_000))
    os.utime(stream_dir / "part-001.parquet", (2_000_000, 2_000_000))

    from nyxus_spark.streaming.stateful import TAGGED_SCHEMA

    src = (
        spark.readStream.schema(TAGGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    out = asof_join_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT doc_id, event_id, ts_us, matched_ts_us, n_tok FROM asof_stream_out"
    ).toPandas()
    # prove both micro-batches ran (state carry actually exercised)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 2

    from nyxus_spark.sources import probes, tokens_versions

    v = tokens_versions(spark, sf_dir).select("doc_id", "ts", "n_tok")
    p = probes(spark, sf_dir)
    exp = asof_join(p, v).select(
        "doc_id",
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.col("matched_ts").cast("timestamp")).alias("matched_ts_us"),
        F.col("n_tok").cast("long").alias("n_tok"),
    ).toPandas()

    key = ["doc_id", "event_id"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e)
    for col in ["doc_id", "event_id", "ts_us", "matched_ts_us", "n_tok"]:
        gv = g[col].astype("object").where(g[col].notna(), None)
        ev = e[col].astype("object").where(e[col].notna(), None)
        mism = [(a, b) for a, b in zip(gv, ev) if a != b]
        assert not mism, f"{col}: {mism[:5]}"
    tagged.unpersist()


def test_stream_asof_late_probe_matches_older_version(spark, tmp_path):
    """ADVICE r1 scenario: batch 1 delivers versions t=1 and t=5; batch 2
    delivers a probe at t=3. Latest-only state would silently emit NULL;
    the bounded version history must match the correct older version t=1."""
    import pandas as pd

    from nyxus_spark.streaming.stateful import TAGGED_SCHEMA

    stream_dir = tmp_path / "late_probe_stream"
    stream_dir.mkdir()

    def _dump(rows, path):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts_us", "is_version",
                                          "n_tok", "event_id"])
        for c in ("ts_us", "is_version", "n_tok", "event_id"):
            pdf[c] = pdf[c].astype("Int64")
        pdf.to_parquet(path)

    _dump([("d", 1, 1, 11, None), ("d", 5, 1, 55, None)],
          stream_dir / "part-000.parquet")
    _dump([("d", 3, 0, None, 7)], stream_dir / "part-001.parquet")
    os.utime(stream_dir / "part-000.parquet", (1_000_000, 1_000_000))
    os.utime(stream_dir / "part-001.parquet", (2_000_000, 2_000_000))

    src = (
        spark.readStream.schema(TAGGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        asof_join_stream(src)
        .writeStream.format("memory")
        .queryName("asof_late_probe_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT event_id, matched_ts_us, n_tok FROM asof_late_probe_out"
    ).collect()
    assert len(got) == 1
    assert got[0].matched_ts_us == 1 and got[0].n_tok == 11


def test_stream_asof_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-restart resumability for the stateful streaming as-of join:
    drain file 1 with a checkpointed query, stop, drop file 2 in, start a NEW
    query on the same checkpoint — the GroupState (latest version per key)
    must be restored from the state store, so the second run's probes match
    versions seen only by the first run."""
    tagged = _tagged_batch(spark, sf_dir).cache()
    split_ts = tagged.approxQuantile("ts_us", [0.5], 0.0)[0]

    stream_dir = tmp_path / "tagged_ckpt_stream"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _dump(df, path):
        pdf = df.toPandas()
        for c in ("ts_us", "is_version", "n_tok", "event_id"):
            pdf[c] = pdf[c].astype("Int64")
        pdf.to_parquet(path)

    from nyxus_spark.streaming.stateful import TAGGED_SCHEMA

    out_dir = str(tmp_path / "out")

    def run_round():
        # parquet sink: the file sink + state store both recover from ckpt
        src = spark.readStream.schema(TAGGED_SCHEMA).parquet(str(stream_dir))
        q = (
            asof_join_stream(src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).toPandas()

    _dump(tagged.filter(F.col("ts_us") <= split_ts), stream_dir / "part-000.parquet")
    out1 = run_round()
    _dump(tagged.filter(F.col("ts_us") > split_ts), stream_dir / "part-001.parquet")
    both = run_round()  # NEW query instance, restored state
    import pandas as pd

    out2 = (
        both.merge(out1[["doc_id", "event_id"]], on=["doc_id", "event_id"],
                   how="left", indicator=True)
        .query("_merge == 'left_only'")
        .drop(columns="_merge")
    )
    got = both

    from nyxus_spark.sources import probes, tokens_versions

    v = tokens_versions(spark, sf_dir).select("doc_id", "ts", "n_tok")
    p = probes(spark, sf_dir)
    exp = asof_join(p, v).select(
        "doc_id",
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.col("matched_ts").cast("timestamp")).alias("matched_ts_us"),
        F.col("n_tok").cast("long").alias("n_tok"),
    ).toPandas()
    assert len(got) == len(exp)
    key = ["doc_id", "event_id"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    for col in ["matched_ts_us", "n_tok"]:
        gv = g[col].astype("object").where(g[col].notna(), None)
        ev = e[col].astype("object").where(e[col].notna(), None)
        mism = [(a, b) for a, b in zip(gv, ev) if a != b]
        assert not mism, f"{col}: {mism[:5]}"
    # round 2 must have produced rows that required round-1 state: at least
    # one probe in file 2 matched a version timestamp from file 1
    r2_matched_old = out2[out2["matched_ts_us"].notna() & (out2["matched_ts_us"] <= split_ts)]
    assert len(r2_matched_old) > 0
    tagged.unpersist()
