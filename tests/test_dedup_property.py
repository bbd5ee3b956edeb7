"""Property-based checks: duplicate_spans and prefix_containment against
independent pure-Python references on adversarial random corpora.

Token alphabets are deliberately tiny (0..3) so cross-document window
collisions, containments, and overlapping spans are dense."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

TOK_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("tokens", ArrayType(IntegerType())),
    StructField("n_tok", IntegerType()),
])

from nyxus_spark.operators.dedup import duplicate_spans, prefix_containment

corpus_st = st.lists(
    st.lists(st.integers(0, 3), min_size=0, max_size=14),
    min_size=1, max_size=8,
)

L = 4


def _ref_duplicate_spans(docs):
    """Pure-python ExactSubstr reference: positions of windows occurring in
    >= 2 distinct docs, merged into maximal spans."""
    occ = {}
    for d, toks in docs.items():
        for p in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[p:p + L]), set()).add(d)
    dup = {g for g, ds in occ.items() if len(ds) >= 2}
    out = {}
    for d, toks in docs.items():
        hits = [p for p in range(len(toks) - L + 1)
                if tuple(toks[p:p + L]) in dup]
        if not hits:
            continue
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1] + L:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        cover = sum(last - first + L for first, last in spans)
        out[d] = (len(hits), len(spans), cover, hits[0])
    return out


def _ref_prefix_pairs(docs):
    out = set()
    for a, ta in docs.items():
        if len(ta) < 8:
            continue
        for b, tb in docs.items():
            if a == b or len(tb) < len(ta) or len(tb) < 8:
                continue
            if len(ta) == len(tb) and not a > b:
                continue
            if tb[:len(ta)] == ta:
                out.add((a, b))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=corpus_st)
def test_duplicate_spans_matches_reference(spark, rows):
    docs = {f"d{i}": toks for i, toks in enumerate(rows)}
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in docs.items()], TOK_SCHEMA)
    got = {r.doc_id: (r.ds_hits, r.ds_spans, r.ds_cover, r.ds_first)
           for r in duplicate_spans(df, L=L).collect()}
    assert got == _ref_duplicate_spans(docs)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.lists(st.integers(0, 1), min_size=0, max_size=12),
    min_size=1, max_size=7,
))
def test_prefix_containment_matches_reference(spark, rows):
    docs = {f"d{i}": toks for i, toks in enumerate(rows)}
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in docs.items()], TOK_SCHEMA)
    got = {(r.id_a, r.id_b) for r in prefix_containment(df, k=8).collect()}
    assert got == _ref_prefix_pairs(docs)
