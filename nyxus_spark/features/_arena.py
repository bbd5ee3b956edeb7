"""Grow-only scratch-buffer arena.

This sandbox (and many container runtimes) services first-touch page faults
extremely slowly, making every large numpy temporary cost ~100× its compute.
Kernels route their big temporaries through named reusable buffers; Spark
Python workers are reused across batches (spark.python.worker.reuse), so the
arena amortizes to zero after the first batch.
"""

from __future__ import annotations

import numpy as np

_BUFS: dict[str, np.ndarray] = {}


def buf(key: str, shape, dtype=np.float64) -> np.ndarray:
    """Return a reusable uninitialized array of `shape` (contents garbage)."""
    need = int(np.prod(shape))
    b = _BUFS.get(key)
    if b is None or b.size < need or b.dtype != np.dtype(dtype):
        b = np.empty(max(need, 1), dtype=dtype)
        _BUFS[key] = b
    return b[:need].reshape(shape)


_ARANGE = np.empty(0, dtype=np.int64)


def arange_buf(n: int) -> np.ndarray:
    """Reusable 0..n-1 int64 view — np.arange over millions of elements costs
    real milliseconds per batch on this host; the ramp never changes, so grow
    it once and slice."""
    global _ARANGE
    if _ARANGE.size < n:
        _ARANGE = np.arange(max(n, 1), dtype=np.int64)
    return _ARANGE[:n]
