"""Wave-32 operators: DSIR importance weights (hashed-bigram n-gram
importance resampling, Xie et al. NeurIPS 2023), k-fold assignment."""
import math

import pytest
from pyspark.sql import functions as F

from nyxus_spark.functions import dsir_weights
from nyxus_spark.functions.text import HB_K1, HB_K2, HB_P31


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def _bucket(a: int, c: int, b: int = 1024) -> int:
    return ((a * HB_K1 + c * HB_K2) % HB_P31) % b


def _py_dsir(rows, target_ids, b: int = 1024):
    """Pure-Python reference: smoothed bucket ratios, sequential product."""
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    nr = nt = 0
    for doc_id, toks in rows:
        for x, y in zip(toks, toks[1:]):
            k = _bucket(x, y, b)
            cr[k] = cr.get(k, 0) + 1
            nr += 1
            if doc_id in target_ids:
                ct[k] = ct.get(k, 0) + 1
                nt += 1
    out = {}
    for doc_id, toks in rows:
        w = 1.0
        for x, y in zip(toks, toks[1:]):
            k = _bucket(x, y, b)
            num = float((ct.get(k, 0) + 1) * (nr + b))
            den = float((cr.get(k, 0) + 1) * (nt + b))
            w = w * (num / den)
        out[doc_id] = w
    return out


@pytest.fixture(scope="module")
def dsir_fixture(spark):
    # target docs (even ids) share a bigram dialect; odd ids another —
    # so target-side ratios genuinely exceed 1 on the target dialect
    rows = []
    for i in range(40):
        if i % 2 == 0:
            toks = [(7 * i + j) % 50 for j in range(30)]
        else:
            toks = [(11 * i + 3 * j) % 200 + 50 for j in range(30)]
        rows.append((i, toks))
    rows.append((99, [5]))   # single-token doc: zero pairs, weight 1.0
    rows.append((98, []))    # empty doc
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows], ["doc_id", "tokens", "n_tok"]
    ).withColumn("tokens", F.col("tokens").cast("array<int>"))
    return rows, df


def test_dsir_matches_python_reference(spark, dsir_fixture):
    rows, df = dsir_fixture
    target = {i for i, _ in rows if i % 2 == 0}
    _, scored = dsir_weights(df, (F.col("doc_id") % 2 == 0))
    got = {r.doc_id: (r.dsir_w, r.dsir_pairs, r.dsir_keep)
           for r in scored.collect()}
    exp = _py_dsir(rows, target)
    assert set(got) == set(exp)
    for doc_id, (w, pairs, keep) in got.items():
        assert w == exp[doc_id], f"doc {doc_id}: {w} != {exp[doc_id]}"
        assert pairs == max(len(dict(rows)[doc_id]) - 1, 0)
        assert keep == (1 if w > 1.0 else 0)


def test_dsir_separates_target_dialect(spark, dsir_fixture):
    rows, df = dsir_fixture
    _, scored = dsir_weights(df, (F.col("doc_id") % 2 == 0))
    got = {r.doc_id: r.dsir_w for r in scored.collect()}
    # every target-dialect doc must outweigh every non-target doc
    tgt = [w for i, w in got.items() if i < 90 and i % 2 == 0]
    oth = [w for i, w in got.items() if i < 90 and i % 2 == 1]
    assert min(tgt) > max(oth)
    # zero-pair docs carry the neutral weight exactly
    assert got[99] == 1.0 and got[98] == 1.0


def test_dsir_ratio_array_shape(spark, dsir_fixture):
    _, df = dsir_fixture
    ratios_row, _ = dsir_weights(df, (F.col("doc_id") % 2 == 0))
    arr = ratios_row.collect()[0].dsir_arr
    assert len(arr) == 1024
    assert all(math.isfinite(v) and v > 0 for v in arr)
