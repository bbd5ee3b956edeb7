"""pack_sequences: shard-local concat-then-chunk context-window packing.

Checked against a direct pandas re-implementation and by its structural
invariants (offset contiguity within a shard, exact pack arithmetic,
boundary spans, zero-length handling, validation errors)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyxus_spark.operators.packing import pack_sequences

_MIX = 2654435761
_P31 = 2147483647


def _ref_pack(rows, capacity, n_shards):
    """Reference: per-shard running offsets in id order, pure Python ints."""
    by_shard = {}
    for i, n in sorted(rows):
        sh = (i % _P31) * (_MIX % _P31) % _P31 % n_shards
        by_shard.setdefault(sh, []).append((i, n))
    out = {}
    for sh, docs in by_shard.items():
        off = 0
        for i, n in docs:
            first = off // capacity
            last = (off + n - 1) // capacity
            out[i] = (sh, off, first, last, int(last > first),
                      min(n, capacity * (first + 1) - off))
            off += n
    return out


@pytest.fixture(scope="module")
def packed(spark):
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, n_tok int")
    got = pack_sequences(df, capacity=64, id_expr=F.col("id"), n_shards=4).toPandas()
    return rows, got


def test_matches_reference(packed):
    rows, got = packed
    ref = _ref_pack(rows, 64, 4)
    for r in got.itertuples():
        assert ref[r.id] == (r.pack_shard, r.pack_start, r.pack_first,
                             r.pack_last, r.pack_spans, r.pack_head_fill), r.id


def test_shard_streams_contiguous(packed):
    """Within a shard, offsets tile the concat stream with no gaps."""
    rows, got = packed
    for _, g in got.sort_values(["pack_shard", "id"]).groupby("pack_shard"):
        off = 0
        for r in g.itertuples():
            assert r.pack_start == off
            off += r.n_tok
        # every token is packed exactly once: ends partition [0, off)
        assert g.n_tok.sum() == off


def test_pack_arithmetic(packed):
    _, got = packed
    assert (got.pack_first == got.pack_start // 64).all()
    assert (got.pack_last == (got.pack_start + got.n_tok - 1) // 64).all()
    assert ((got.pack_spans == 1) == (got.pack_last > got.pack_first)).all()
    head = got.apply(lambda r: min(r.n_tok, 64 * (r.pack_first + 1) - r.pack_start), axis=1)
    assert (got.pack_head_fill == head).all()
    assert got.pack_spans.sum() > 0  # the fixture crosses boundaries


def test_zero_length_rows_hold_offset(spark):
    df = spark.createDataFrame([(1, 10), (2, 0), (3, 10)], "id bigint, n_tok int")
    got = (pack_sequences(df, capacity=8, id_expr=F.col("id"), n_shards=1)
           .toPandas().set_index("id"))
    assert got.loc[2, "pack_head_fill"] == 0
    # the empty row does not shift its successor
    assert got.loc[3, "pack_start"] == got.loc[1, "pack_start"] + 10


def test_validation(spark):
    df = spark.createDataFrame([(1, 5)], "id bigint, n_tok int")
    with pytest.raises(ValueError):
        pack_sequences(df, capacity=0, id_expr=F.col("id"))
    with pytest.raises(ValueError):
        pack_sequences(df, capacity=8, id_expr=F.col("id"), n_shards=0)


def test_single_exchange_plan(spark):
    """The physical plan carries exactly one Exchange — the shard hash."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("int").alias("n_tok"))
    plan = (pack_sequences(df, capacity=32, id_expr=F.col("id"), n_shards=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# pack_ffd (first-fit decreasing, document-integrity packing)
# ---------------------------------------------------------------------------

def _py_ffd(rows, capacity, n_shards=4):
    MIX, P31 = 2654435761, 2147483647
    from collections import defaultdict

    by = defaultdict(list)
    for i, n in rows:
        by[((i % P31) * (MIX % P31)) % P31 % n_shards].append((n, i))
    out = {}
    for s, docs in by.items():
        docs.sort(key=lambda x: (-x[0], x[1]))
        loads = []
        for n, i in docs:
            b = next((j for j, l in enumerate(loads) if l + n <= capacity), None)
            if b is None:
                loads.append(n)
                b = len(loads) - 1
            else:
                loads[b] += n
            out[i] = (s, b + 1)
        for n, i in docs:
            out[i] = out[i] + (loads[out[i][1] - 1], len(loads))
    return out


def test_pack_ffd_matches_python(spark):
    from pyspark.sql import functions as F

    from nyxus_spark.operators.packing import pack_ffd

    rows = [(i, 5 + (i * 53) % 120) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = pack_ffd(df, 128, F.col("doc_id"), n_shards=4).collect()
    exp = _py_ffd(rows, 128)
    for r in got:
        assert (r["pack_shard"], r["ffd_bin"], r["ffd_load"], r["ffd_bins"]) \
            == exp[r["doc_id"]]
    # capacity law: no bin holding only fitting docs exceeds capacity
    assert all(r["ffd_load"] <= 128 for r in got if r["n_tok"] <= 128)


def test_pack_ffd_oversize_gets_own_bin(spark):
    from pyspark.sql import functions as F

    from nyxus_spark.operators.packing import pack_ffd

    df = spark.createDataFrame(
        [(0, 300), (1, 10), (2, 10)], "doc_id long, n_tok long")
    got = {r["doc_id"]: r for r in
           pack_ffd(df, 128, F.col("doc_id"), n_shards=1).collect()}
    big = got[0]
    assert big["ffd_load"] == 300  # alone in its (overfull) bin
    others = [got[1], got[2]]
    assert all(o["ffd_bin"] != big["ffd_bin"] for o in others)
    with pytest.raises(ValueError):
        pack_ffd(df, 0, F.col("doc_id"))


def test_lpt_matches_python_and_balance_law(spark):
    from nyxus_spark.operators.packing import lpt_assign

    rows = [(i, 5 + (i * 53) % 120) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {r["doc_id"]: (r["lpt_worker"], r["lpt_load"], r["lpt_makespan"])
           for r in lpt_assign(df, 4, F.col("doc_id")).collect()}
    loads = [0] * 4
    exp = {}
    for n, i in sorted(((n, i) for i, n in rows), key=lambda x: (-x[0], x[1])):
        w = loads.index(min(loads))
        loads[w] += n
        exp[i] = w + 1
    for i, n in rows:
        assert got[i][0] == exp[i]
        assert got[i][1] == loads[exp[i] - 1]
        assert got[i][2] == max(loads)
    # Graham's bound: makespan <= (4/3 - 1/(3k))·OPT, OPT >= total/k
    total = sum(n for _, n in rows)
    assert max(loads) <= (4 / 3) * max(total / 4, max(n for _, n in rows)) + 1
    with pytest.raises(ValueError):
        lpt_assign(df, 0, F.col("doc_id"))
