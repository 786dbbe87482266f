from wimbd_spark.operators.topk import (
    botk_ngrams,
    ngram_counts,
    topk_ngrams,
    unique_ngrams,
)
from wimbd_spark.operators.stats import corpus_stats, extreme_token_docs
from wimbd_spark.operators.count import (
    count_sequences,
    search_regex_counts,
    search_regex_locations,
)
from wimbd_spark.operators.keycount import key_count, normalize_distribution

__all__ = [
    "botk_ngrams",
    "ngram_counts",
    "topk_ngrams",
    "unique_ngrams",
    "corpus_stats",
    "extreme_token_docs",
    "count_sequences",
    "search_regex_counts",
    "search_regex_locations",
    "key_count",
    "normalize_distribution",
]
