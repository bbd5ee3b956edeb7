"""Engine settings, mirroring the reference's comparability-relevant defaults.

Reference defaults: coarse_gray_depth=64 (/root/reference/src/nyx/python/nyxus/
nyxus.py:76,169), DEFAULT_NUM_HISTO_BINS fallback (src/nyx/constants.h:4),
softNAN result placeholder for degenerate ROIs (src/nyx/features/intensity.cpp:93),
GLCM offset=1 and angles {0,45,90,135} (src/nyx/features/glcm.cpp:9).
In the 1-D token-stream recast there is a single "angle" (the forward direction
along the sequence), so angled families emit one value per offset instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FeatureSettings:
    # number of bins of the custom-resolution histogram used by first-order
    # ENTROPY/UNIFORMITY/HISTOGRAM and the IH_* family
    n_bins: int = 64
    # grey-binning selector shared by all texture families
    # (src/nyx/features/texture_feature.h:101-103):
    #   < 0 → radiomics binning with |grey_info| bins (1-based, 0 stays 0)
    #   > 0 → matlab slope/intercept binning with grey_info levels
    #   = 0 → IBSI identity (tokens used as grey levels as-is)
    grey_info: int = 64
    # neighborhood offset for co-occurrence / dependence kernels
    # (1-D recast of GLCM offset, src/nyx/cli_glcm_options.h:20)
    offset: int = 1
    # offsets for the multi-offset texture sections — the 1-D analog of the
    # reference's per-angle {0,45,90,135} GLCM/GLRLM output
    # (src/nyx/output_2_csv.cpp:97-127): one column per offset d plus an
    # _AVE column averaging over offsets (featureset.h:205-268 *_AVE codes).
    # NOTE: the registered multi-offset feature NAMES derive from the default
    # tuple; a custom tuple must keep the same values to use those sections.
    offsets: tuple[int, ...] = (1, 2, 4)
    # symmetric co-occurrence accumulation (src/nyx/features/glcm.cpp:475-477)
    symmetric_glcm: bool = False
    # value emitted for degenerate (constant / empty) sequences
    softnan: float = field(default=math.nan)
    # vocabulary guard: tokens are int32 ids in [0, vocab)
    vocab_size: int = 50257


DEFAULT_SETTINGS = FeatureSettings()
