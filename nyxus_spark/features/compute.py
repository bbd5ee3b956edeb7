"""Feature extraction as a narrow Spark transformation.

One input row = one entity-version whose `tokens` array is the nyxus "pixel
cloud" (/root/reference/src/nyx/roi_cache.h:48); features are per-row, so the
whole extraction is mapInPandas — zero shuffle, scales linearly with input
splits on a 1000-executor cluster. Inside each Arrow batch the kernels are
segment-vectorized numpy (see segmented.py), the engine's analog of nyxus's
reduce phase (src/nyx/reduce_trivial_rois.cpp) without the per-ROI thread pool:
Spark tasks are the parallelism, numpy the vector unit.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

from nyxus_spark.features.registry import plan_sections, resolve_features
from nyxus_spark.settings import DEFAULT_SETTINGS, FeatureSettings


def extract_features(
    df: DataFrame,
    features: list[str] | None = None,
    settings: FeatureSettings = DEFAULT_SETTINGS,
    tokens_col: str = "tokens",
    keep_tokens: bool = True,
) -> DataFrame:
    """Append one float64 column per requested feature.

    `features` accepts nyxus-style names and groups (*ALL_INTENSITY*, *ALL*…).
    Section gating mirrors the reference's `required()` checks — only kernels
    whose features are requested ever run (featureset pruning, SURVEY.md §2 F6).
    """
    names = resolve_features(features)
    section_list = plan_sections(names)

    in_fields = [f for f in df.schema.fields if keep_tokens or f.name != tokens_col]
    existing = {f.name for f in in_fields}
    feat_fields = [StructField(n, DoubleType()) for n in names if n not in existing]
    out_schema = StructType(in_fields + feat_fields)
    out_cols = [f.name for f in in_fields] + [f.name for f in feat_fields]
    wanted = [f.name for f in feat_fields]

    # capture plain values (picklable, no Spark objects) in the closure
    sec_fns = [(s.name, s.fn) for s in section_list]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nyxus_spark.features.segmented import Segments

        for pdf in batches:
            seg = Segments(pdf[tokens_col].to_numpy())
            vals: dict = {}
            for _, fn in sec_fns:
                vals.update(fn(seg, settings))
            base = pdf if keep_tokens else pdf.drop(columns=[tokens_col])
            feat = pd.DataFrame({n: vals[n] for n in wanted}, index=base.index)
            yield pd.concat([base, feat], axis=1)[out_cols]

    return df.mapInPandas(gen, out_schema)
