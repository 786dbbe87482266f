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
    search_snippets,
)
from wimbd_spark.operators.keycount import (
    mixture_sample,
    stratified_sample,
    id_lookup,
    key_count,
    normalize_distribution,
    sample_by_hash,
)
from wimbd_spark.operators.dedup import (
    contamination_rate,
    contamination_rate_indexed,
    contamination_rate_ngrams,
    contamination_report,
    decontaminate,
    decontaminate_by_ngrams,
    dedup_keep_first,
    dedup_paragraphs,
    duplicate_stats,
    find_examples,
    mark_duplicates,
    multi_overlap,
    overlap,
)
from wimbd_spark.operators.neardup import (
    cross_jaccard_pairs,
    drop_near_duplicates,
    fuzzy_decontaminate,
    neardup_components,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash16,
    simhash_pairs,
)
from wimbd_spark.operators.lm import (
    bigram_lm,
    bigram_perplexity_filter,
    bigram_score,
    lm_score,
    perplexity_filter,
    unigram_lm,
)
from wimbd_spark.operators.similarity import (
    cluster_balanced_sample,
    cosine_pairs_ivf,
    cosine_topk,
    cosine_topk_ivf_pq_indexed,
    cosine_topk_lsh,
    cosine_topk_pq,
    knn_join,
    knn_join_pq,
    pq_codebooks,
    semantic_duplicates_ivf,
)
from wimbd_spark.operators.urlfilter import (
    filter_by_domain_blocklist,
    host_suffixes,
)
from wimbd_spark.operators.textqc import (
    dedup_lines_within_doc,
    doc_fingerprint,
    gram_novelty,
    script_profile,
    langid_heuristic,
    quality_scores,
    tfidf_top_terms,
    token_count,
    token_count_bpe_ish,
)
from wimbd_spark.operators.packing import (
    pack_documents,
    pack_stats,
    packed_sequences,
)
from wimbd_spark.operators.windows import (
    session_stats,
    sessionize,
    sliding_agg,
    tumbling_agg,
)
from wimbd_spark.operators.asof import asof_join, interval_join
from wimbd_spark.operators.winnow import (
    boilerplate_fingerprints,
    remove_shared_spans,
    remove_spans_by_fingerprint,
    shared_span_examples,
    shared_spans,
    winnow_fingerprints,
    winnow_overlap,
    winnow_select,
)
from wimbd_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_decontaminate,
)
from wimbd_spark.operators.bm25 import (
    bm25_topk,
    bm25_topk_batch,
    bm25_topk_batch_indexed,
    bm25_topk_indexed,
    build_doclen_stats,
    more_like_this,
)
from wimbd_spark.operators.classifier import (
    fit_nb_classifier,
    nb_quality_filter,
    nb_score,
    nb_top_fraction,
)
from wimbd_spark.operators.fusion import hybrid_search, rrf_fuse
from wimbd_spark.operators.sampling import (
    sample_key,
    weighted_sample,
    weighted_sample_by,
)
from wimbd_spark.operators.clustering import (
    assign_clusters,
    kmeans,
    kmeans_cluster_stats,
    kmeans_fit,
)
from wimbd_spark.operators.pii import (
    demographic_cooccurrence,
    extract_pii,
    pii_counts,
    redact_pii,
    taxonomy_counts,
)
from wimbd_spark.operators.compare import (
    gram_overlap,
    js_divergence,
    log_odds_tokens,
    token_freq_spectrum,
    vocab_cosine,
    vocab_stats,
)
from wimbd_spark.operators.heavyhitters import (
    ngram_summary,
    topk_ngrams_2pass,
    topk_ngrams_2pass_by,
)
from wimbd_spark.operators.dsir import (
    dsir_log_weights,
    dsir_top_fraction,
    fit_log_ratio,
    hashed_feature_counts,
)
from wimbd_spark.operators.mixture import (
    temperature_allocation,
    unimax_allocation,
)
from wimbd_spark.operators.funnel import quality_funnel, quality_funnel_by

__all__ = [
    "botk_ngrams", "ngram_counts", "topk_ngrams", "unique_ngrams",
    "corpus_stats", "extreme_token_docs",
    "count_sequences", "search_regex_counts", "search_snippets", "search_regex_locations",
    "id_lookup", "key_count", "mixture_sample", "normalize_distribution",
    "sample_by_hash", "stratified_sample",
    "contamination_rate", "contamination_rate_indexed",
    "contamination_rate_ngrams", "contamination_report",
    "decontaminate", "decontaminate_by_ngrams", "dedup_keep_first",
    "dedup_paragraphs",
    "duplicate_stats", "find_examples", "mark_duplicates", "multi_overlap",
    "overlap",
    "cross_jaccard_pairs", "fuzzy_decontaminate",
    "unigram_lm", "lm_score", "perplexity_filter",
    "bigram_lm", "bigram_score", "bigram_perplexity_filter",
    "filter_by_domain_blocklist", "host_suffixes", "tfidf_top_terms",
    "gram_novelty", "script_profile",
    "drop_near_duplicates", "neardup_components",
    "jaccard_pairs", "lsh_candidate_pairs", "minhash_dedup_pairs",
    "minhash_signatures", "simhash16", "simhash_pairs",
    "cosine_topk", "cosine_topk_lsh", "cosine_topk_pq", "pq_codebooks",
    "cosine_topk_ivf_pq_indexed",
    "knn_join", "knn_join_pq", "cosine_pairs_ivf",
    "semantic_duplicates_ivf",
    "doc_fingerprint", "langid_heuristic", "quality_scores",
    "token_count", "token_count_bpe_ish",
    "pack_documents", "pack_stats", "packed_sequences",
    "session_stats", "sessionize", "sliding_agg", "tumbling_agg",
    "demographic_cooccurrence", "extract_pii", "pii_counts",
    "redact_pii", "taxonomy_counts",
    "dedup_lines_within_doc",
    "gram_overlap", "js_divergence", "log_odds_tokens",
    "token_freq_spectrum", "vocab_cosine", "vocab_stats",
    "ngram_summary", "topk_ngrams_2pass", "topk_ngrams_2pass_by",
    "dsir_log_weights", "dsir_top_fraction", "fit_log_ratio",
    "hashed_feature_counts",
    "temperature_allocation", "unimax_allocation", "quality_funnel", "quality_funnel_by",
    "cluster_balanced_sample",
    "asof_join", "interval_join",
    "winnow_fingerprints", "winnow_overlap", "winnow_select",
    "shared_spans", "remove_shared_spans", "shared_span_examples",
    "boilerplate_fingerprints", "remove_spans_by_fingerprint",
    "bloom_build", "bloom_contains", "bloom_decontaminate",
    "bm25_topk", "bm25_topk_batch", "bm25_topk_batch_indexed",
    "bm25_topk_indexed", "build_doclen_stats",
    "more_like_this",
    "fit_nb_classifier", "nb_quality_filter", "nb_score",
    "nb_top_fraction",
    "hybrid_search", "rrf_fuse",
    "sample_key", "weighted_sample", "weighted_sample_by",
    "assign_clusters", "kmeans", "kmeans_fit", "kmeans_cluster_stats",
]
