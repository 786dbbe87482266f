from wimbd_spark.functions.text import (
    char_ngrams,
    doc_hash,
    hash32,
    hash64,
    ngrams,
    ngram_strings,
    tokenize,
    tokenize_words,
    url_ext_bucket,
    url_host,
    url_scheme,
    year_of,
)

__all__ = [
    "char_ngrams",
    "doc_hash",
    "hash32",
    "hash64",
    "ngrams",
    "ngram_strings",
    "tokenize",
    "tokenize_words",
    "url_ext_bucket",
    "url_host",
    "url_scheme",
    "year_of",
]
