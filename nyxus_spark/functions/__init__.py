from nyxus_spark.functions.text import (  # noqa: F401
    langid_expr,
    quality_exprs,
    token_count_exprs,
    fingerprint_expr,
    vocab_topk,
    deterministic_sample,
    chunk_tokens,
    ngram_keys,
    repetition_stats,
    contamination,
    stratified_keep,
    stratified_sample,
    bpe_merge_count,
    epoch_shuffle_key,
    remap_tokens,
    STOPWORDS,
)
from nyxus_spark.functions.semistructured import parse_json_col  # noqa: F401
