"""Property tests for the round-4 exact-arithmetic paths.

* midpoint-central moments: the kernel's float binomial chain equals the
  exact rational computed in unbounded Python ints (hypothesis over random
  token arrays — the chain must stay exact-dyadic at any plausible length);
* autocorrelation numerators: exact shift dot products vs pure Python.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nyxus_spark.features.moments import moments_section
from nyxus_spark.features.segmented import Segments
from nyxus_spark.settings import FeatureSettings


def _seg(tokens_lists):
    flat = np.concatenate([np.asarray(t, dtype=np.int32) for t in tokens_lists]) \
        if any(len(t) for t in tokens_lists) else np.array([], dtype=np.int32)
    lengths = np.array([len(t) for t in tokens_lists], dtype=np.int64)
    return Segments.from_flat(flat, lengths)


def _mid_exact(tokens, p):
    """Exact midpoint moment via unbounded ints: Σ w·(2i−(n−1))^p / 2^p."""
    n = len(tokens)
    num = sum(int(w) * (2 * i - (n - 1)) ** p for i, w in enumerate(tokens))
    return num / (2 ** p)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=250),
                         min_size=1, max_size=600),
                min_size=1, max_size=4))
def test_midpoint_chain_exact(docs):
    out = moments_section(_seg(docs), FeatureSettings())
    for r, toks in enumerate(docs):
        if sum(toks) == 0:
            continue
        for p, code in ((1, "MOM_MID_1"), (2, "MOM_MID_2"),
                        (3, "MOM_MID_3"), (4, "MOM_MID_4")):
            exact = _mid_exact(toks, p)
            got = out[code][r]
            # the kernel chain is built from exact-representable dyadics at
            # these magnitudes — demand full equality, not closeness
            assert got == exact, (code, r, got, exact)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=250), min_size=0, max_size=300),
       st.sampled_from([1, 2, 4]))
def test_acf_numerator_exact(tokens, k):
    """The Spark-side ACF expression semantics: Σ x_i·x_{i+k} over i."""
    exact = sum(tokens[i] * tokens[i + k] for i in range(max(len(tokens) - k, 0)))
    arr = np.asarray(tokens, dtype=np.int64)
    got = int((arr[:-k] * arr[k:]).sum()) if len(arr) > k else 0
    assert got == exact
