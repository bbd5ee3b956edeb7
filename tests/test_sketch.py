"""Count-Min Sketch and HyperLogLog: the guarantee properties the driver
gate cannot express (it checks exact replay; these check the estimators
actually estimate).

CMS: est(t) >= true(t) always (one-sided error), and depth-4 min tightens
the row-wise overestimate. HLL: the raw estimator lands within the
documented relative-error envelope once n is past the small-range regime,
and the register state merges commutatively (union = max of registers).
"""

import pytest
from pyspark.sql import Row, functions as F

from nyxus_spark.functions.sketch import (
    CMS_PARAMS,
    cms_bucket,
    cms_estimate,
    cms_table,
    hll_summary,
)


def _token_corpus(spark, n_docs=200, seed_tokens=50):
    # deterministic skewed corpus: token t appears ~ (seed_tokens - t) times
    rows = []
    for d in range(n_docs):
        toks = [(d * 7 + i) % seed_tokens for i in range(1 + d % 13)]
        rows.append(Row(doc_id=d, tokens=toks))
    return spark.createDataFrame(rows)


def test_cms_overestimate_property(spark):
    df = _token_corpus(spark)
    cms = cms_table(df)
    true = (
        df.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    est = cms_estimate(true, cms).toPandas()
    assert len(est) > 0
    assert (est.cms_est >= est.cnt).all(), "CMS one-sided error violated"
    # total sketch mass per row j equals the stream length (counts conserved)
    n_stream = df.select(F.sum(F.size("tokens"))).first()[0]
    per_row = cms.groupBy("j").agg(F.sum("c").alias("s")).toPandas()
    assert set(per_row.s) == {n_stream}


def test_cms_depth_min_tightens(spark):
    # the depth-4 min estimate is never worse than any single row's estimate
    df = _token_corpus(spark)
    cms = cms_table(df)
    true = (
        df.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    d4 = cms_estimate(true, cms, depth=4).selectExpr(
        "token", "cms_est AS est4"
    )
    d1 = cms_estimate(true, cms, depth=1).selectExpr(
        "token", "cms_est AS est1"
    )
    j = d4.join(d1, "token").toPandas()
    assert (j.est4 <= j.est1).all()


def test_cms_depth_guard(spark):
    df = _token_corpus(spark, n_docs=5)
    with pytest.raises(ValueError, match="depth"):
        cms_table(df, depth=len(CMS_PARAMS) + 1)


def test_cms_bucket_range_and_negatives(spark):
    # UNK = -1 and huge ids both land in [0, width)
    df = spark.createDataFrame(
        [Row(t=-1), Row(t=0), Row(t=2**40), Row(t=-(2**40))]
    )
    got = df.select(
        *[cms_bucket(F.col("t"), j).alias(f"b{j}") for j in range(4)]
    ).toPandas()
    for j in range(4):
        assert got[f"b{j}"].between(0, 63).all()


def test_hll_accuracy_envelope(spark):
    # m=64 raw HLL: 1.04/sqrt(64) = 13% standard error; allow 3 sigma at
    # n >> m (past the small-range bias regime)
    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("source"), F.col("id").alias("doc_id")
    )
    got = hll_summary(df, "source", "doc_id").first()
    assert got.hll_present + got.hll_v == 64
    rel = abs(got.hll_est4 - n) / n
    assert rel < 0.40, f"HLL est {got.hll_est4} vs true {n}: rel err {rel}"


def test_hll_merge_is_register_max(spark):
    # sketch(A ∪ B) register state == elementwise max of sketch(A), sketch(B)
    a = spark.range(0, 3000).select(
        F.lit("g").alias("source"), F.col("id").alias("doc_id")
    )
    b = spark.range(2000, 6000).select(
        F.lit("g").alias("source"), F.col("id").alias("doc_id")
    )
    u = hll_summary(a.union(b), "source", "doc_id").first()
    # rebuild union registers from the two halves' raw register tables
    from nyxus_spark.functions.sketch import HLL_MIX, P31, hll_rho

    def regs(df):
        h = F.pmod(F.pmod(F.col("doc_id"), F.lit(P31)) * F.lit(HLL_MIX), F.lit(P31))
        br = hll_rho(h)
        return (
            df.select(br.alias("br"))
            .select(F.col("br.bucket").alias("bucket"), F.col("br.rho").alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("m"))
        )
    ra = {r.bucket: r.m for r in regs(a).collect()}
    rb = {r.bucket: r.m for r in regs(b).collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    rmax = max(merged.values())
    snum = sum(2 ** (rmax - v) for v in merged.values()) + (64 - len(merged)) * 2**rmax
    assert u.hll_rmax == rmax
    assert u.hll_snum == snum
    assert u.hll_present == len(merged)


def test_hll_m_guard(spark):
    df = spark.range(5).select(
        F.lit("g").alias("source"), F.col("id").alias("doc_id")
    )
    with pytest.raises(ValueError, match="m must be"):
        hll_summary(df, m=17)


def test_cms_join_size_upper_bound(spark):
    """Cormode–Muthukrishnan inner-product estimator: collisions only ADD
    mass, so min_j Σ cmsA·cmsB ≥ the exact join size Σ_t c_a(t)·c_b(t)."""
    from collections import Counter

    from nyxus_spark.functions.sketch import cms_join_size, cms_table

    ta = [[(i * 13 + j) % 97 for j in range(20)] for i in range(30)]
    tb = [[(i * 29 + j * 3) % 97 for j in range(15)] for i in range(25)]
    da = spark.createDataFrame([(i, v) for i, v in enumerate(ta)],
                               "doc_id long, tokens array<int>")
    db = spark.createDataFrame([(i, v) for i, v in enumerate(tb)],
                               "doc_id long, tokens array<int>")
    est = cms_join_size(cms_table(da), cms_table(db)).first()["js_cms_est"]
    ca = Counter(t for row in ta for t in row)
    cb = Counter(t for row in tb for t in row)
    true = sum(ca[t] * cb[t] for t in ca if t in cb)
    assert est >= true > 0


def test_cms_join_size_exact_for_single_token(spark):
    """A one-token vocabulary cannot collide with anything: the estimate
    equals the exact join size."""
    from nyxus_spark.functions.sketch import cms_join_size, cms_table

    da = spark.createDataFrame([(0, [5] * 7)], "doc_id long, tokens array<int>")
    db = spark.createDataFrame([(0, [5] * 3)], "doc_id long, tokens array<int>")
    est = cms_join_size(cms_table(da), cms_table(db)).first()["js_cms_est"]
    assert est == 21
