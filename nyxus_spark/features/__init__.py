from nyxus_spark.features.compute import extract_features  # noqa: F401
from nyxus_spark.features.registry import resolve_features, FEATURE_GROUPS  # noqa: F401
