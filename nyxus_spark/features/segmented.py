"""Segment-vectorized numpy primitives.

An Arrow batch of N rows with `tokens: array<int32>` is flattened into one
contiguous int64 array plus per-row offsets; every kernel then operates on all
N rows at once with bincount / reduceat / lexsort tricks — no Python loop over
rows, mirroring the "zero per-row Python" constraint (BASELINE.json input_hint).

This is the Spark-first replacement for the reference's per-ROI accumulator
loop (/root/reference/src/nyx/pixel_feed.cpp:19-43): where nyxus upserts pixels
into an unordered_map<label, LR> one at a time, we treat the whole batch as a
segmented array and reduce per segment.
"""

from __future__ import annotations

import numpy as np


class Segments:
    """Flat view over a column of variable-length int arrays."""

    __slots__ = ("flat", "lengths", "starts", "row_idx", "n_rows", "_tex_cache")

    @classmethod
    def from_flat(cls, flat: np.ndarray, lengths: np.ndarray) -> "Segments":
        """Build directly from a flattened value buffer + per-row lengths —
        the zero-copy Arrow ListArray path (values buffer + offsets), skipping
        per-row numpy object allocation entirely."""
        self = cls.__new__(cls)
        n = len(lengths)
        self.n_rows = n
        self.lengths = np.ascontiguousarray(lengths, dtype=np.int64)
        self.flat = np.ascontiguousarray(flat, dtype=np.int64)
        self.starts = np.zeros(n, dtype=np.int64)
        if n:
            np.cumsum(self.lengths[:-1], out=self.starts[1:])
        self.row_idx = np.repeat(np.arange(n, dtype=np.int64), self.lengths)
        return self

    def __init__(self, token_cells) -> None:
        n = len(token_cells)
        self.n_rows = n
        if n == 0:
            self.flat = np.empty(0, dtype=np.int64)
            self.lengths = np.empty(0, dtype=np.int64)
            self.starts = np.empty(0, dtype=np.int64)
            self.row_idx = np.empty(0, dtype=np.int64)
            return
        _empty = np.empty(0, dtype=np.int64)
        # null cells (SQL NULL token arrays) behave as empty sequences
        arrays = [
            _empty if t is None else (a if (a := np.asarray(t)).ndim else _empty)
            for t in token_cells
        ]
        self.lengths = np.fromiter((a.size for a in arrays), dtype=np.int64, count=n)
        total = int(self.lengths.sum())
        if total:
            self.flat = np.concatenate(arrays).astype(np.int64, copy=False)
        else:
            self.flat = np.empty(0, dtype=np.int64)
        self.starts = np.zeros(n, dtype=np.int64)
        np.cumsum(self.lengths[:-1], out=self.starts[1:])
        self.row_idx = np.repeat(np.arange(n, dtype=np.int64), self.lengths)

    # ---- reductions -------------------------------------------------------

    def seg_sum(self, x: np.ndarray | None = None) -> np.ndarray:
        """Per-row sum of x (defaults to token values), float64."""
        w = self.flat if x is None else x
        return np.bincount(self.row_idx, weights=w, minlength=self.n_rows)

    def seg_count(self, mask: np.ndarray) -> np.ndarray:
        return np.bincount(self.row_idx[mask], minlength=self.n_rows)

    def seg_sum_where(self, x: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return np.bincount(self.row_idx[mask], weights=x[mask], minlength=self.n_rows)

    def _seg_ureduce(self, ufunc, x: np.ndarray, fill: float) -> np.ndarray:
        """ufunc.reduceat per segment; empty segments get `fill`.

        reduceat over the starts of non-empty rows spans exactly each row's
        elements because empty rows contribute no elements in between.
        """
        out = np.full(self.n_rows, fill, dtype=np.float64)
        nz = self.lengths > 0
        if nz.any():
            out[nz] = ufunc.reduceat(x.astype(np.float64, copy=False), self.starts[nz])
        return out

    def seg_min(self, x: np.ndarray | None = None, fill: float = np.nan) -> np.ndarray:
        return self._seg_ureduce(np.minimum, self.flat if x is None else x, fill)

    def seg_max(self, x: np.ndarray | None = None, fill: float = np.nan) -> np.ndarray:
        return self._seg_ureduce(np.maximum, self.flat if x is None else x, fill)

    # ---- ordering ---------------------------------------------------------

    def sorted_within(self) -> np.ndarray:
        """Token values sorted within each row (flat layout preserved)."""
        if self.flat.size == 0:
            return self.flat
        vmax = int(self.flat.max())
        vmin = int(self.flat.min())
        span = vmax - vmin + 1
        # composite single-key sort (row*span + value) beats lexsort's two
        # argsort passes ~2×; falls back for pathological value ranges
        if self.n_rows * span < (1 << 62):
            keys = self.row_idx * span + (self.flat - vmin)
            keys.sort(kind="stable")
            out = keys % span
            if vmin:
                out += vmin
            return out
        order = np.lexsort((self.flat, self.row_idx))
        return self.flat[order]

    def value_runs(self, sorted_flat: np.ndarray):
        """(row, value, count) triples of distinct values per row.

        Requires `sorted_flat` from sorted_within(). Vectorized run-length
        encoding over the concatenation.
        """
        if sorted_flat.size == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        row_of = self.row_idx  # row_idx is already sorted ascending
        new_run = np.empty(sorted_flat.size, dtype=bool)
        new_run[0] = True
        np.not_equal(sorted_flat[1:], sorted_flat[:-1], out=new_run[1:])
        new_run[1:] |= row_of[1:] != row_of[:-1]
        run_starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(run_starts, sorted_flat.size))
        return row_of[run_starts], sorted_flat[run_starts], counts

    # ---- per-row histograms ----------------------------------------------

    def seg_bincount(self, bin_idx: np.ndarray, n_bins: int, mask: np.ndarray | None = None) -> np.ndarray:
        """(n_rows, n_bins) matrix of per-row bin counts; bin_idx must be in
        [0, n_bins)."""
        rows = self.row_idx
        if mask is not None:
            rows = rows[mask]
            bin_idx = bin_idx[mask]
        key = rows * n_bins + bin_idx
        out = np.bincount(key, minlength=self.n_rows * n_bins)
        return out.reshape(self.n_rows, n_bins)


def per_row(values_by_row: np.ndarray, seg: Segments) -> np.ndarray:
    """Broadcast a per-row vector to flat element positions."""
    return values_by_row[seg.row_idx]
