"""Deterministic token-table derivation (the engine's input model).

BASELINE.json input_hint mandates a table
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string), versioned
with ts for point-in-time ops. We synthesize it *deterministically* from the
driver-shipped parquet (documents → static corpus; events → versioned
sequences + probe timestamps) using only integer arithmetic that Spark SQL and
DuckDB evaluate identically — every Spark derivation below has a DuckDB CTE
twin (SQL_* constants) used by the correctness oracle.

This plays the role of the reference's ingest layer (tiled TIFF/Zarr readers,
/root/reference/src/nyx/grayscale_tiff.h, abs_tile_loader.h): at 100 TB the
real source is an Iceberg table read with partition/row-group pruning; here
the derivation is pure column expressions on a parquet scan, so Catalyst
pushes column pruning into the scan and nothing is materialized.

Degenerate rows required by reference NaN-path semantics
(src/nyx/features/intensity.cpp:60-96, glcm.cpp:27-95) are guaranteed:
event_id % 17 == 0 → constant sequence (min==max blank-ROI path);
event_id % 32 == 0 → single-token sequence; token value 0 occurs naturally
(background-skip analog, glcm.cpp:445-446).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


SOURCE_FORMATS = ("parquet", "csv", "json", "orc")


def load_path(spark: SparkSession, path: str, fmt: str = "parquet",
              schema=None, header: bool = True) -> DataFrame:
    """Multi-format source abstraction (the reference's format-dispatching
    ingest, nyxus.py:291-370 featurize_directory accepting several file
    types): one entry point over Spark's native readers. Pass an explicit
    `schema` for the schemaless text formats (csv/json) — at 100 TB you
    never want a schema-inference scan."""
    if fmt not in SOURCE_FORMATS:
        raise ValueError(f"unknown source format {fmt!r}; one of {SOURCE_FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        return r.option("header", str(header).lower()).csv(path)
    if fmt == "json":
        return r.json(path)
    if fmt == "orc":
        return r.orc(path)
    return r.parquet(path)


# --------------------------------------------------------------------------
# Static corpus tokens (from documents): one row per doc, no time axis.
# token(w) = (ascii(w)*7 + length(w)*13) % 251  for each whitespace word.
# --------------------------------------------------------------------------

def tokens_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    toks = F.transform(
        words, lambda w: ((F.ascii(w) * F.lit(7) + F.length(w) * F.lit(13)) % F.lit(251)).cast("int")
    )
    return docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("source"),
    )


SQL_TOKENS_STATIC = """
tokens_static AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id,
         list_transform(
           list_filter(string_split(text, ' '), w -> w <> ''),
           w -> CAST((ascii(w)*7 + length(w)*13) % 251 AS INTEGER)
         ) AS tokens,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INTEGER) AS n_tok,
         source
  FROM documents
)
""".strip()


# --------------------------------------------------------------------------
# Versioned sequences (from events): multiple (doc_id, ts) versions per doc.
#   doc_id  = 'u' || user_id
#   k       = 1 + event_id % 32 tokens
#   tokens  = constant (event_id % 249 + 1)            if event_id % 17 == 0
#           = ((event_id%97)*31 + i*17 + (i*i)%13) % 251  otherwise
# versions: event_id % 4 != 0 ; probes: event_id % 4 == 0
# --------------------------------------------------------------------------

def _event_tokens():
    k = (F.lit(1) + F.col("event_id") % F.lit(32)).cast("int")
    idx = F.sequence(F.lit(0), k - F.lit(1))
    const_tok = (F.col("event_id") % F.lit(249) + F.lit(1)).cast("int")
    return F.when(
        F.col("event_id") % F.lit(17) == F.lit(0),
        F.transform(idx, lambda i: const_tok),
    ).otherwise(
        F.transform(
            idx,
            lambda i: (
                ((F.col("event_id") % F.lit(97)) * F.lit(31) + i * F.lit(17) + (i * i) % F.lit(13))
                % F.lit(251)
            ).cast("int"),
        )
    )


def tokens_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    toks = _event_tokens()
    return (
        ev.filter(F.col("event_id") % 4 != 0)
        .select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            toks.alias("tokens"),
            F.size(toks).cast("int").alias("n_tok"),
            F.col("event_type").alias("source"),
            F.col("value"),
            F.col("event_id"),
        )
    )


def probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 4 == 0).select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id"),
    )


SQL_VERSIONS = """
versions AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS doc_id,
         ts,
         CASE WHEN event_id % 17 = 0
              THEN list_transform(range(0, 1 + event_id % 32),
                                  i -> CAST(event_id % 249 + 1 AS INTEGER))
              ELSE list_transform(range(0, 1 + event_id % 32),
                                  i -> CAST(((event_id % 97)*31 + i*17 + (i*i) % 13) % 251 AS INTEGER))
         END AS tokens,
         CAST(1 + event_id % 32 AS INTEGER) AS n_tok,
         event_type AS source,
         value,
         event_id
  FROM events WHERE event_id % 4 <> 0
)
""".strip()

SQL_PROBES = """
probes AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS doc_id, ts, event_id
  FROM events WHERE event_id % 4 = 0
)
""".strip()
