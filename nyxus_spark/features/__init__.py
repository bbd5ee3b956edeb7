from nyxus_spark.features.compute import extract_features  # noqa: F401
from nyxus_spark.features.registry import (  # noqa: F401
    list_feature_groups,
    resolve_features,
)
