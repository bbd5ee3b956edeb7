"""Grey binning shared by all texture kernels — faithful port of the three
modes of /root/reference/src/nyx/features/texture_feature.h:23-197:

* grey_info < 0 → "radiomics" binning (texture_feature.h:106-118):
    y = 0 if x == 0 else min(int((x-min)/binW) + 1, n)   with binW = (max-min)/n
  (1-based bins, the last bin one unit wider, raw 0 stays 0 = background)
* grey_info > 0 → "matlab" binning (texture_feature.h:138-196):
    y = 1 if x == 0 else clip(int(floor(slope*x + 1)), 1, n), slope = n/max
* grey_info == 0 → IBSI identity (tokens are grey levels as-is).

Mode is selected by the sign of grey_info (texture_feature.h:101-103).
"""

from __future__ import annotations

import numpy as np


def bin_tokens(x: np.ndarray, vmin: np.ndarray, vmax: np.ndarray, grey_info: int) -> np.ndarray:
    """Vectorized binning of flat token values; vmin/vmax are per-element
    (already broadcast to flat positions)."""
    x = x.astype(np.float64, copy=False)
    if grey_info == 0:
        return x.astype(np.int64)
    n = abs(int(grey_info))
    if grey_info < 0:
        rng = vmax - vmin
        binw = np.where(rng > 0, rng / n, 1.0)
        y = ((x - vmin) / binw).astype(np.int64) + 1
        np.clip(y, None, n, out=y)
        y[x == 0] = 0
        return y
    # matlab
    slope = np.where(vmax > 0, n / np.where(vmax > 0, vmax, 1), 0.0)
    y = np.floor(slope * x + 1.0).astype(np.int64)
    np.clip(y, 1, n, out=y)
    y[x == 0] = 1
    return y


def n_levels(grey_info: int, binned_max: int) -> int:
    """Upper bound of the level value domain for dense per-row matrices."""
    if grey_info == 0:
        return int(binned_max)
    return abs(int(grey_info))
