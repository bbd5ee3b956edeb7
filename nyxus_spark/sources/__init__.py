from nyxus_spark.sources.tables import (  # noqa: F401
    SOURCE_FORMATS,
    load_path,
    load_table,
    tokens_static,
    tokens_versions,
    probes,
    SQL_TOKENS_STATIC,
    SQL_VERSIONS,
    SQL_PROBES,
)
