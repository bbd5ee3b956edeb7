"""Wave-13 operators: incremental dedup and the size-controlled writer."""

import glob
import random

import pytest

from nyxus_spark.operators.dedup import dedup_incremental, exact_dedup
from nyxus_spark.sinks import write_sized


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, key string")


def test_incremental_equals_full_rerun_on_new_batch(spark):
    """Invariant: incremental survivors == the new-batch survivors of a
    full re-dedup over old ∪ new (keys already seen never survive; fresh
    duplicate keys keep their lowest new id)."""
    rng = random.Random(3)
    old = [(f"a{i:03d}", f"k{rng.randrange(30)}") for i in range(60)]
    new = [(f"n{i:03d}", f"k{rng.randrange(60)}") for i in range(60)]
    odf, ndf = _corpus(spark, old), _corpus(spark, new)
    inc = {r.doc_id for r in
           dedup_incremental(ndf, odf.select("key"), ["key"]).collect()}
    full = {r.doc_id for r in
            exact_dedup(odf.unionByName(ndf), ["key"]).collect()
            if r.doc_id.startswith("n")}
    assert inc == full
    assert inc, "fixture produced no fresh keys"


def test_incremental_drops_all_seen_keys(spark):
    odf = _corpus(spark, [("a1", "a"), ("a2", "b")])
    ndf = _corpus(spark, [("n1", "a"), ("n2", "b"), ("n3", "c"), ("n4", "c")])
    got = sorted(r.doc_id for r in
                 dedup_incremental(ndf, odf.select("key"), ["key"]).collect())
    assert got == ["n3"]


def test_write_sized_bounds_files(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    parts = write_sized(df, str(tmp_path / "out"), target_rows_per_file=100)
    assert parts == 10
    files = glob.glob(str(tmp_path / "out" / "*.parquet"))
    # repartition is not perfectly even (AQE rebalance); the cap splits any
    # overfull partition, so the count is bounded, not exact
    assert parts <= len(files) <= 2 * parts
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 1000
    # no file may exceed the cap (the maxRecordsPerFile side of the bound)
    for f in files:
        assert spark.read.parquet(f).count() <= 100


def test_write_sized_known_total_skips_count(spark, tmp_path):
    df = spark.range(250).selectExpr("id")
    parts = write_sized(df, str(tmp_path / "out2"), 100, total_rows=250)
    assert parts == 3
    assert spark.read.parquet(str(tmp_path / "out2")).count() == 250


def test_write_sized_validation(spark):
    with pytest.raises(ValueError):
        write_sized(None, "/tmp/x", 0)
