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
