"""Co-located (bucketed) as-of join: with both sides written bucketed+sorted
on doc_id, the cogroup_merge strategy's required ClusteredDistribution is
satisfied by the bucketed scans — the flagship operator plans with ZERO
Exchange (the 100 TB co-location story; Iceberg analog: bucket(doc_id)
partition transform)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyxus_spark.operators import asof_join
from nyxus_spark.sinks import write_bucketed
from nyxus_spark.sources import probes, tokens_versions


def _tables(spark, sf_dir, tmp_path):
    v = tokens_versions(spark, sf_dir).select("doc_id", "ts", "n_tok")
    p = probes(spark, sf_dir)
    write_bucketed(v, "v_bucketed_test", path=str(tmp_path / "v_b"))
    write_bucketed(p, "p_bucketed_test", path=str(tmp_path / "p_b"))
    return spark.table("v_bucketed_test"), spark.table("p_bucketed_test"), v, p


def test_bucketed_cogroup_asof_zero_exchange(spark, sf_dir, tmp_path):
    vb, pb, v, p = _tables(spark, sf_dir, tmp_path)
    out = asof_join(pb, vb, strategy="cogroup_merge")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert "Bucketed: true" in plan

    # identical results to the shuffling strategies on the raw inputs
    key = ["doc_id", "event_id"]
    got = out.select(*key, "matched_ts", "n_tok").toPandas().sort_values(key).reset_index(drop=True)
    exp = (
        asof_join(p, v).select(*key, "matched_ts", "n_tok")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert got.equals(exp)
    spark.sql("DROP TABLE IF EXISTS v_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS p_bucketed_test")
