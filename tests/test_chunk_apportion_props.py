"""Property tests: chunk_tokens coverage/containment invariants (the
round-3 advisor bug — a trailing chunk fully contained in its predecessor —
stays dead) and largest-remainder apportionment laws."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def chunk_case(draw):
    size = draw(st.integers(min_value=1, max_value=12))
    overlap = draw(st.integers(min_value=0, max_value=size - 1))
    n = draw(st.integers(min_value=0, max_value=60))
    return size, overlap, n


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(chunk_case())
def test_chunk_tokens_covers_without_contained_windows(spark, case):
    from nyxus_spark.functions import chunk_tokens

    size, overlap, n = case
    toks = list(range(n))
    df = spark.createDataFrame(
        [("d", toks, n)],
        "doc_id string, tokens array<int>, n_tok int")
    rows = sorted(
        ((r.chunk_id, r.chunk_tokens) for r in
         chunk_tokens(df, size, overlap).collect()),
    )
    if n == 0:
        assert rows == []
        return
    # chunk ids are consecutive from 0; chunks are the right slices
    stride = size - overlap
    assert [cid for cid, _ in rows] == list(range(len(rows)))
    covered = set()
    prev_end = None
    for cid, ck in rows:
        start = cid * stride
        assert ck == toks[start:start + size]
        covered.update(range(start, min(start + size, n)))
        # THE regression property: every window extends coverage past its
        # predecessor (no window fully contained in the previous one)
        end = min(start + size, n)
        if prev_end is not None:
            assert end > prev_end
        prev_end = end
    assert covered == set(range(n))


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=50),
)
def test_largest_remainder_laws(spark, counts, k):
    from nyxus_spark.functions import largest_remainder_alloc

    rows = [(f"s{i}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, ["source"])
    out = {r.source: r for r in largest_remainder_alloc(df, k).collect()}
    tot = sum(counts)
    # exactly k allocated; every floor respected; bonus at most 1
    assert sum(r.lr_alloc for r in out.values()) == k
    for i, c in enumerate(counts):
        r = out[f"s{i}"]
        assert r.lr_floor == k * c // tot
        assert r.lr_alloc in (r.lr_floor, r.lr_floor + 1)
        # quota-monotone: never more than the ceiling of the exact share
        assert r.lr_alloc <= -(-k * c // tot)
