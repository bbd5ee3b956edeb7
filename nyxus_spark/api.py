"""Top-level user API mirroring the reference's Python entry point.

The reference exposes `Nyxus(features, **params)` with `featurize` (in-memory
arrays), `featurize_directory` / `featurize_files` (path sources)
(/root/reference/src/nyx/python/nyxus/nyxus.py:145-506). This module is the
Spark-first counterpart: construct once with a feature selection + settings,
then featurize DataFrames, parquet/Iceberg paths, in-memory token lists, or
point-in-time (probes, versions) pairs. A reference user maps:

    Nyxus(["*ALL*"]).featurize(I, M)          → NyxusSpark(["*ALL*"]).featurize_memory(spark, tokens)
    Nyxus(f).featurize_directory(dir)         → NyxusSpark(f).featurize_path(spark, path)
    per-(image, ROI, t_index) wide row        → per-(doc_id[, ts]) wide row

All heavy lifting stays in the existing engine modules: extract_features
(narrow mapInArrow kernels), asof_join (point-in-time), sinks.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from nyxus_spark.features import extract_features
from nyxus_spark.settings import DEFAULT_SETTINGS, FeatureSettings


class NyxusSpark:
    """Configured feature-extraction engine (reference: nyxus.py:145-246
    `Nyxus.__init__` — feature list + comparability-relevant knobs)."""

    def __init__(
        self,
        features: list[str] | None = None,
        settings: FeatureSettings | None = None,
        coarse_gray_depth: int | None = None,
        offset: int | None = None,
        tokens_col: str = "tokens",
    ) -> None:
        st = settings or DEFAULT_SETTINGS
        if coarse_gray_depth is not None:
            # reference coarse_gray_depth (nyxus.py:169) drives both the
            # custom histogram and the texture grey binning
            st = replace(st, n_bins=coarse_gray_depth, grey_info=coarse_gray_depth)
        if offset is not None:
            st = replace(st, offset=offset)
        self.features = features or ["*ALL*"]
        self.settings = st
        self.tokens_col = tokens_col

    # -- core ---------------------------------------------------------------

    def featurize(
        self, df: DataFrame, keep_tokens: bool = False,
        annotations: list[str] | None = None,
    ) -> DataFrame:
        """One wide feature row per input row (the reference's per-ROI
        vector, one float64 column per enabled feature). `annotations`
        passes input columns through as `anno{i}` strings ahead of the
        features (output_2_csv.cpp:62-80)."""
        return extract_features(
            df, self.features, settings=self.settings,
            tokens_col=self.tokens_col, keep_tokens=keep_tokens,
            annotations=annotations,
        )

    def featurize_path(
        self, spark: SparkSession, path: str, fmt: str = "parquet",
        keep_tokens: bool = False,
    ) -> DataFrame:
        """Featurize a stored table (reference featurize_directory,
        nyxus.py:291-370; Iceberg tables pass fmt='iceberg' + table name)."""
        df = (
            spark.table(path) if fmt == "iceberg"
            else spark.read.format(fmt).load(path)
        )
        return self.featurize(df, keep_tokens=keep_tokens)

    def featurize_memory(
        self, spark: SparkSession, token_lists: list, doc_ids: list[str] | None = None,
        keep_tokens: bool = False,
    ) -> DataFrame:
        """Featurize in-memory token arrays (reference featurize over numpy
        montages, nyxus.py:373-506 — zero-copy in via Arrow)."""
        ids = doc_ids or [f"doc_{i}" for i in range(len(token_lists))]
        df = spark.createDataFrame(
            [(i, [int(t) for t in toks], len(toks)) for i, toks in zip(ids, token_lists)],
            f"doc_id string, {self.tokens_col} array<int>, n_tok int",
        )
        return self.featurize(df, keep_tokens=keep_tokens)

    def featurize_asof(
        self, probes: DataFrame, versions: DataFrame, keep_tokens: bool = False,
        **asof_kwargs,
    ) -> DataFrame:
        """Point-in-time feature vectors: as-of join each probe (doc_id, ts)
        to its latest sequence version, then featurize the matched tokens —
        the engine's flagship pipeline (north-rule per-(entity, timestamp)
        vectors with zero temporal leakage)."""
        from pyspark.sql import functions as F

        from nyxus_spark.operators import asof_join

        matched = asof_join(probes, versions, **asof_kwargs).filter(
            F.col(self.tokens_col).isNotNull()
        )
        return self.featurize(matched, keep_tokens=keep_tokens)
