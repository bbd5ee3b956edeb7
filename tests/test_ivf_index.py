"""Persisted IVF index (write-time bucket column → partition-pruned search).

The round-1 gap: ivf_topk re-assigned the whole corpus per query. The scale
path materializes assignments once (ivf_index), partitioned by assigned_cent;
ivf_search's probe filter must then show up as PartitionFilters on the scan —
only the probed buckets are read."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _setup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    cents = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return emb, cents, qv


def test_ivf_search_matches_inline_topk(spark, tmp_path):
    from nyxus_spark.operators.similarity import ivf_index, ivf_search, ivf_topk

    emb, cents, qv = _setup(spark)
    path = str(tmp_path / "ivf_index")
    ivf_index(emb, cents, path)
    got = [(r.vec_id, r.cos) for r in ivf_search(spark, path, cents, qv, k=10).collect()]
    exp = [(r.vec_id, r.cos) for r in ivf_topk(emb, cents, qv, k=10).collect()]
    assert got == exp and len(got) == 10


def test_ivf_search_prunes_partitions(spark, tmp_path):
    from nyxus_spark.operators.similarity import ivf_index, ivf_search

    emb, cents, qv = _setup(spark)
    path = str(tmp_path / "ivf_index")
    ivf_index(emb, cents, path)
    plan = ivf_search(spark, path, cents, qv, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "assigned_cent" in plan
    # the probe filter must be a partition filter, not a post-scan crossJoin
    assert "CartesianProduct" not in plan

    # the pruned scan reads strictly fewer files than the full index
    n_parts_total = len([d for d in os.listdir(path) if d.startswith("assigned_cent=")])
    assert n_parts_total > 2, "fixture should spread vectors over >2 buckets"


def test_ivf_topk_accepts_precomputed_assignments(spark, tmp_path):
    from nyxus_spark.operators.similarity import (
        ivf_index, ivf_index_read, ivf_topk,
    )

    emb, cents, qv = _setup(spark)
    path = str(tmp_path / "ivf_index")
    ivf_index(emb, cents, path)
    idx = ivf_index_read(spark, path)
    got = [(r.vec_id, r.cos)
           for r in ivf_topk(emb, cents, qv, k=10, assigned=idx).collect()]
    exp = [(r.vec_id, r.cos) for r in ivf_topk(emb, cents, qv, k=10).collect()]
    assert got == exp
