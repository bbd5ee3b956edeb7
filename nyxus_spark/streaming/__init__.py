from nyxus_spark.streaming.stream import sessionize_stream, stream_feature_extract  # noqa: F401
