"""Leakage validators: clean pipeline passes, a deliberately leaky join fails."""

import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators import asof_join
from nyxus_spark.sources import probes, tokens_versions
from nyxus_spark.validate import assert_no_leakage, assert_truncation_invariant


def test_clean_asof_passes(spark, sf_dir):
    v = tokens_versions(spark, sf_dir).select("doc_id", "ts", "n_tok")
    p = probes(spark, sf_dir)
    out = asof_join(p, v)
    assert assert_no_leakage(out) == p.count()
    cutoff = v.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    n = assert_truncation_invariant(
        p, v, lambda pp, vv: asof_join(pp, vv), F.timestamp_seconds(F.lit(cutoff)).cast("timestamp_ntz"),
        compare_cols=["doc_id", "event_id", "matched_ts", "n_tok"],
    )
    assert n > 0


def test_leaky_join_detected(spark, sf_dir):
    v = tokens_versions(spark, sf_dir).select("doc_id", "ts", "n_tok")
    p = probes(spark, sf_dir)

    def leaky(pp, vv):
        # FORWARD-looking join: deliberately wrong
        j = pp.join(vv.select("doc_id", F.col("ts").alias("matched_ts"), "n_tok"), "doc_id")
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id", "event_id").orderBy(F.col("matched_ts").asc())
        return (
            j.filter(F.col("matched_ts") > F.col("ts"))
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
        )

    out = leaky(p, v)
    if out.count() == 0:
        pytest.skip("no forward matches in this data slice")
    with pytest.raises(AssertionError, match="temporal leakage"):
        assert_no_leakage(out)
