"""One-call training-data pipeline — the composed corpus-cleaning lifecycle.

The individual operators (quality filters, decontamination, exact/near/segment
dedup, mixture sampling, sequence packing, epoch-ordered materialization) each
exist as oracle-gated primitives in `operators/` and `functions/`; this module
wires them into the single config-driven call a corpus owner actually runs:

    from nyxus_spark.pipeline import PipelineConfig, clean_corpus

    res = clean_corpus(docs, PipelineConfig(min_tokens=8, near_jaccard=0.5,
                                            segment_delim=104,
                                            pack_capacity=2048),
                       bench_df=benchmark_docs)
    res.docs                    # cleaned token table (doc_id, tokens, n_tok, source)
    res.provenance              # every dropped doc_id + the stage that dropped it
    res.stage_counts()          # per-stage drop counts (lazy DataFrame)
    res.packs                   # context-window pack assignment (if configured)
    res.write_epoch(path, 0)    # reproducible epoch-shuffled materialization

Reference analog: `Nyxus(...).featurize_directory` is the reference's one-call
lifecycle (scan -> segment -> feature -> write; nyxus.py:291-370); this is the
same product shape for the corpus-preparation side of the engine.

Stage order (each optional, config-driven) and the standard pipeline it
mirrors (CCNet / Gopher / RefinedWeb-style):

    1. length filter          n_tok in [min_tokens, max_tokens]
    2. repetition filter      duplicate-3-gram ratio quality rule
    3. decontamination        benchmark n-gram overlap (broadcast, no shuffle)
    4. exact dedup            lowest-id-wins on the full token sequence
    5. near dedup             MinHash-LSH pairs >= jaccard, higher id dropped
    6. segment dedup          line/paragraph first-wins + optional boilerplate
    7. mixture sampling       temperature p_s ~ n_s^alpha, or a flat rate
    8. sequence packing       shard-local concat-then-chunk window assignment

Scale shape: every stage is the already-audited operator (broadcast dims,
skew-safe min-struct aggregations, banded LSH — never all-pairs); the glue
adds only left-anti joins for drop provenance, which are lazy and computed
only when `provenance`/`stage_counts()` are materialized. `temperature_rates`
is the one eager step (a strata-sized driver dict, prescan shape).

Determinism: sampling/packing/epoch keys derive from `id_expr` (default
xxhash64(doc_id)) via the shared (id*MIX mod P31) family, so a cleaned corpus,
its sample, and every epoch order are re-derivable forever.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for `clean_corpus`; None / False disables a stage."""

    # 1. length filter (docs outside [min_tokens, max_tokens] drop)
    min_tokens: int = 1
    max_tokens: int | None = None
    # 2. intra-doc repetition rule: drop docs whose duplicate-3-gram ratio
    #    exceeds this (Gopher-style); None disables
    max_rep3_ratio: float | None = None
    # 3. decontamination n-gram length (active only when bench_df is given)
    decontaminate_n: int = 8
    # 4. exact dedup on the full token sequence
    exact: bool = True
    # 5. near-dup MinHash-LSH threshold; None disables
    near_jaccard: float | None = 0.5
    # 5b. SemDeDup semantic dedup: cosine threshold over the quantized
    #     embedding table (requires embeddings_df + centroids_df at call
    #     time); None disables
    semantic_threshold: float | None = None
    # 6. segment-level dedup: split on this token id; None disables.
    #    boilerplate_min_docs flags segments appearing in >= that many docs;
    #    drop_boilerplate also removes them (flag-only matches the
    #    corpus_clean gate semantics).
    segment_delim: int | None = None
    boilerplate_min_docs: int | None = None
    drop_boilerplate: bool = False
    # 7. mixture sampling: temperature alpha in {1.0, 0.75, 0.5, 0.25}
    #    (per-source p_s ~ n_s^alpha), else a flat deterministic rate
    temperature_alpha: float | None = None
    sample_rate: float | None = None
    # 8. context-window packing
    pack_capacity: int | None = None
    pack_shards: int = 8


class CorpusCleanResult:
    """Outputs of `clean_corpus`: the cleaned docs, full drop provenance,
    and (optionally) the pack assignment — all lazy DataFrames."""

    def __init__(self, docs: DataFrame, provenance: DataFrame,
                 packs: DataFrame | None, id_expr: Column) -> None:
        self.docs = docs
        self.provenance = provenance
        self.packs = packs
        self._id_expr = id_expr

    def stage_counts(self) -> DataFrame:
        """(drop_stage, docs_dropped) — the "where did my docs go?" audit."""
        return (self.provenance.groupBy("drop_stage")
                .agg(F.count(F.lit(1)).cast("long").alias("docs_dropped"))
                .orderBy("drop_stage"))

    def write_epoch(self, path: str, epoch: int, n_files: int = 32,
                    mode: str = "overwrite") -> None:
        """Materialize one epoch's reproducible global training order
        (sinks.write_training_order: range-partition + in-partition sort on
        the epoch-shuffle key — non-overlapping sorted files)."""
        from nyxus_spark.sinks import write_training_order

        src = self.packs if self.packs is not None else self.docs
        write_training_order(src, path, epoch, self._id_expr,
                             n_files=n_files, mode=mode)


def _dropped(before: DataFrame, after: DataFrame, stage: str,
             id_col: str) -> DataFrame:
    """Ids present before a stage but not after it, tagged with the stage
    name. Lazy left-anti join — only evaluated if provenance is read."""
    return (before.select(id_col)
            .join(after.select(id_col), id_col, "left_anti")
            .select(id_col, F.lit(stage).alias("drop_stage")))


def clean_corpus(
    df: DataFrame,
    config: PipelineConfig = PipelineConfig(),
    bench_df: DataFrame | None = None,
    embeddings_df: DataFrame | None = None,
    centroids_df: DataFrame | None = None,
    id_expr: Column | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    source_col: str = "source",
    emb_vec_col: str = "qvec",
) -> CorpusCleanResult:
    """Run the configured cleaning stages over a token table
    (doc_id, tokens, n_tok, source) and return docs + provenance + packs.

    `id_expr` is the deterministic integer identity used by sampling,
    packing, and epoch ordering (default `xxhash64(doc_id)` — pass e.g.
    ``F.expr("cast(substr(doc_id, 5) as bigint)")`` to reproduce the gate
    queries' id arithmetic exactly).

    Semantic dedup (config.semantic_threshold) takes `embeddings_df`
    (id_col + an int-quantized `emb_vec_col`, see
    similarity.quantize_embedding) and `centroids_df` (cent_id,
    cent_qvec — the SemDeDup cluster-blocking coarse quantizer, e.g. from
    similarity.kmeans_step); drops each doc whose cluster holds a lower-id
    member within the cosine threshold (operators/dedup.semdedup).
    """
    cfg = config
    if id_expr is None:
        id_expr = F.xxhash64(F.col(id_col))
    cur = df
    prov: list[DataFrame] = []

    def step(nxt: DataFrame, stage: str) -> DataFrame:
        prov.append(_dropped(cur, nxt, stage, id_col))
        return nxt

    # 1. length rule — pure pushdown-able predicate
    if cfg.min_tokens > 0 or cfg.max_tokens is not None:
        keep = F.col(n_tok_col) >= cfg.min_tokens
        if cfg.max_tokens is not None:
            keep = keep & (F.col(n_tok_col) <= cfg.max_tokens)
        cur = step(cur.filter(keep), "1_length")

    # 2. repetition rule — duplicate-3-gram ratio (docs shorter than the
    #    gram emit no stats row and pass, matching the operator's contract)
    if cfg.max_rep3_ratio is not None:
        from nyxus_spark.functions.text import repetition_stats

        rep = repetition_stats(cur, n=3, tokens_col=tokens_col,
                               n_tok_col=n_tok_col, id_col=id_col)
        bad = rep.filter(F.col("rep_dup_ratio") > cfg.max_rep3_ratio)
        cur = step(cur.join(bad.select(id_col), id_col, "left_anti"),
                   "2_repetition")

    # 3. decontamination — broadcast benchmark-gram probe, no corpus shuffle
    if bench_df is not None:
        from nyxus_spark.functions.text import contamination

        cm = contamination(cur, bench_df, n=cfg.decontaminate_n,
                           tokens_col=tokens_col, n_tok_col=n_tok_col,
                           id_col=id_col)
        dirty = cm.filter(F.col("is_contaminated") == 1).select(id_col)
        cur = step(cur.join(dirty, id_col, "left_anti"), "3_contaminated")

    # 4. exact dedup — lowest id per identical sequence (skew-safe agg)
    if cfg.exact:
        from nyxus_spark.operators.dedup import exact_dedup

        keyed = cur.withColumn(
            "__key",
            F.concat_ws(",", F.transform(tokens_col,
                                         lambda x: x.cast("string"))),
        )
        cur = step(exact_dedup(keyed, ["__key"], id_col=id_col).drop("__key"),
                   "4_exact_dup")

    # 5. near dedup — banded MinHash-LSH candidates, higher id of each
    #    verified pair drops (candidates only, never all-pairs)
    if cfg.near_jaccard is not None:
        from nyxus_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(cur, jaccard_threshold=cfg.near_jaccard)
        drop_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
        cur = step(cur.join(drop_ids, id_col, "left_anti"), "5_near_dup")

    # 5b. semantic dedup — SemDeDup cluster-blocked cosine (Σ|cluster|²
    #     candidates, never all-pairs); drops the higher id of each
    #     within-threshold cluster pair
    if cfg.semantic_threshold is not None:
        if embeddings_df is None or centroids_df is None:
            raise ValueError(
                "semantic_threshold needs embeddings_df and centroids_df")
        from nyxus_spark.operators.dedup import semdedup

        sd = semdedup(embeddings_df, centroids_df,
                      threshold=cfg.semantic_threshold,
                      id_col=id_col, vec_col=emb_vec_col)
        sem_drop = sd.filter(F.col("sd_drop") == 1).select(id_col)
        cur = step(cur.join(sem_drop, id_col, "left_anti"),
                   "5b_semantic_dup")

    # 6. segment dedup — first-wins line dedup, optional boilerplate pass,
    #    docs rebuilt from surviving segments (all-dup docs drop out)
    if cfg.segment_delim is not None:
        from nyxus_spark.operators.dedup import (
            boilerplate_segments,
            reassemble_segments,
            segment_dedup,
        )

        segs = segment_dedup(cur, delim=cfg.segment_delim,
                             tokens_col=tokens_col, n_tok_col=n_tok_col,
                             id_col=id_col, keep_tokens=True)
        if cfg.boilerplate_min_docs is not None:
            segs = boilerplate_segments(segs,
                                        min_docs=cfg.boilerplate_min_docs,
                                        id_col=id_col)
            if cfg.drop_boilerplate:
                segs = segs.withColumn(
                    "seg_kept",
                    F.when(F.col("bp_flag") == 1, F.lit(0))
                    .otherwise(F.col("seg_kept")),
                )
        rebuilt = reassemble_segments(segs, id_col=id_col)
        # reattach the passthrough columns the segment table does not carry
        side = cur.drop(tokens_col, n_tok_col)
        cur = step(rebuilt.join(side, id_col)
                   .select(id_col, tokens_col, n_tok_col, *[
                       c for c in side.columns if c != id_col]),
                   "6_all_segments_dup")

    # 7. mixture sampling — temperature rates per source, or a flat rate;
    #    both on the shared deterministic hash (nested & re-derivable)
    if cfg.temperature_alpha is not None:
        from nyxus_spark.functions.text import (
            stratified_keep,
            temperature_rates,
        )

        rates = temperature_rates(cur, stratum_col=source_col,
                                  alpha=cfg.temperature_alpha)
        cur = step(cur.filter(stratified_keep(rates, source_col, id_expr)),
                   "7_mixture_sample")
    elif cfg.sample_rate is not None:
        from nyxus_spark.functions.text import deterministic_sample

        cur = step(deterministic_sample(cur, cfg.sample_rate, id_expr),
                   "7_sample")

    # 8. packing — shard-local concat-then-chunk context windows
    packs = None
    if cfg.pack_capacity is not None:
        from nyxus_spark.operators.packing import pack_sequences

        packs = pack_sequences(cur, cfg.pack_capacity, id_expr,
                               n_shards=cfg.pack_shards, len_col=n_tok_col)

    if prov:
        provenance = reduce(lambda a, b: a.unionByName(b), prov)
    else:
        provenance = df.sparkSession.createDataFrame(
            [], f"{id_col} string, drop_stage string")
    return CorpusCleanResult(cur, provenance, packs, id_expr)
