from nyxus_spark.streaming.stateful import asof_join_stream  # noqa: F401
from nyxus_spark.streaming.stream import sessionize_stream, stream_feature_extract  # noqa: F401
