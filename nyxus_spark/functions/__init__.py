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
    STOPWORDS,
)
