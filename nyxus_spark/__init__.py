"""nyxus_spark — a from-scratch PySpark-native point-in-time feature-engineering
engine in the spirit of PolusAI/nyxus (reference at /root/reference, studied for
semantics only; architecture is Spark-first).

Data model (BASELINE.json input_hint):
    token table: (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)
    versioned variant adds ts: timestamp — the as-of join right side.

One row = one entity-version; the token array plays the role of a nyxus ROI
pixel cloud (reference: src/nyx/roi_cache.h:48). Feature extraction is therefore
a *narrow* transformation (mapInPandas, no shuffle); the only wide operations
are the as-of join, window ops, and dedup/similarity joins.
"""

__version__ = "0.2.0"

from nyxus_spark.api import NyxusSpark  # noqa: F401
from nyxus_spark.settings import FeatureSettings  # noqa: F401
