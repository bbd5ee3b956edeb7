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


def test_recall_at_k_hand_computed(spark):
    """recall@k vs a known ground truth: hits/|exact| exact integers,
    missed queries emit recall 0, ANN-only queries emit nothing."""
    from nyxus_spark.operators.similarity import recall_at_k

    ann = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 99),      # 2 of 3 right
         (1, 20), (1, 21), (1, 22),      # perfect
         (2, 98), (2, 97), (2, 96)],     # total miss
        "query_id bigint, vec_id bigint",
    )
    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12),
         (1, 20), (1, 21), (1, 22),
         (2, 30), (2, 31), (2, 32)],
        "query_id bigint, vec_id bigint",
    )
    rows = {r["query_id"]: r for r in recall_at_k(ann, exact).collect()}
    assert (rows[0]["n_hits"], rows[0]["n_exact"], rows[0]["recall"]) == (2, 3, 0.6667)
    assert (rows[1]["n_hits"], rows[1]["recall"]) == (3, 1.0)
    assert (rows[2]["n_hits"], rows[2]["recall"]) == (0, 0.0)
