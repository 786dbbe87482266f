"""bench.py contract checks (no Spark session — import-level only).

bench.py silently skips HEADLINE names missing from the registry
(`n for n in HEADLINE if n in qs`) — right for forward-compat when a
query is renamed mid-round, wrong as a permanent state: a typo would
quietly shrink the benchmark. This pins every name to a real query."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_headline_names_all_resolve():
    import bench
    import __spark_entry__ as entry

    known = set(entry.queries()) | set(entry.bench_only_queries())
    missing = [n for n in bench.HEADLINE if n not in known]
    assert not missing, f"bench HEADLINE names not in the registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate rows"


def test_final_line_stays_under_driver_tail_capture():
    """The driver tail-captures ~2000 bytes of stdout and JSON-parses
    the last line. r7's line carried 65 per-query timings and outgrew
    the capture (BENCH_r07 parsed:null). The final line is now
    fixed-width: even at 500 queries it must stay well under the cap,
    and it must parse with the headline total intact."""
    import json

    import bench

    timings = {f"query_name_{i:03d}": 1.2345 for i in range(500)}
    builds = {f"index_{i}": 9.87 for i in range(20)}
    line = bench.final_line(timings, builds, builds, 0.1)
    assert len(line) < 1500, f"{len(line)}B final line"
    parsed = json.loads(line)
    assert parsed["value"] == round(500 * 1.2345, 4)
    assert parsed["n_queries"] == 500
    assert parsed["unit"] == "sec"
    # negative sentinel build entries (prepare failure) are excluded
    # from totals rather than poisoning them
    line2 = bench.final_line({"q": 1.0}, {"error": -1.0}, {}, 0.1)
    assert json.loads(line2)["build_total_s"] == 0


def test_bench_only_queries_prefixed():
    # the auto-append picks up bench_* names only; anything else in
    # bench_only_queries() would never be benched
    import __spark_entry__ as entry

    bad = [n for n in entry.bench_only_queries() if not n.startswith("bench_")]
    assert not bad, f"bench-only entries missing the bench_ prefix: {bad}"


def test_final_line_reports_count_and_average():
    """Bench-envelope contract (r11 VERDICT item 7): the driver-parsed
    line must carry headline count AND per-query average so the
    envelope stays comparable as the set grows."""
    import json

    import bench

    parsed = json.loads(bench.final_line({"a": 2.0, "b": 4.0}, {}, {}, 0.1))
    assert parsed["n_queries"] == 2
    assert parsed["per_query_avg_s"] == 3.0
    assert json.loads(bench.final_line({}, {}, {}, 0.1))[
        "per_query_avg_s"
    ] == 0.0


# The headline set as of r12. Queries may be REMOVED freely; any
# ADDITION must first land an isolated warm best-of-3 row in SCALE.md
# (r11 VERDICT item 7: a new >2 s query silently joining the headline
# set eats the driver's 2x envelope without a recorded baseline).
# Update this frozenset IN THE SAME COMMIT as the SCALE.md row.
R12_HEADLINE = frozenset(
    [
        "topk_ngrams_n3_k20", "botk_ngrams_n1_k20", "unique_ngrams_n2",
        "count_sequences", "search_regex_counts", "corpus_stats",
        "lang_counts", "token_length_dist", "dedup_exact_keepfirst",
        "duplicate_stats_by_source", "decontaminate_src0",
        "phrase_doc_counts", "unigram_ttf", "pricing_summary",
        "top_orders_by_revenue", "nation_revenue_europe",
        "events_tumbling_1h", "session_stats_30m_gap",
        "lsh_neardup_pairs", "simhash16", "ann_cosine_topk",
        "quality_scores", "pii_extraction", "find_examples",
        "phrase_slop_count", "unique_ngrams_approx", "orders_rollup",
        "phrase_count_filtered", "top2_orders_per_customer",
        "ngram_jaccard_pairs", "repetition_scores",
        "embedding_cosine_pairs_lsh", "phrase_index_counts",
        "pack_documents_512", "mixture_sample", "neardup_cluster_dedup",
        "phrase_batch_counts", "embedding_cosine_pairs_lsh_auto",
        "simhash62", "repeated_spans_k8", "pii_redaction",
        "dedup_paragraphs", "gram_overlap_src0_src1", "phrase_df_counts",
        "decontaminate_ngrams_src0", "contaminated_examples",
        "fuzzy_decontaminate_src0", "lm_ppl_scores",
        "domain_blocklist_filter", "tfidf_top3_terms",
        "vocab_stats_by_source", "gram_novelty_n4", "script_profile",
        "stratified_sample_k5", "search_snippets_w20", "ivf_index_topk",
        "jpeg_decode_check", "topk_ngrams_2pass_n2_k20",
        "dsir_log_weights_src0", "unimax_mixture_weights",
        "quality_funnel_report", "cluster_balanced_sample_q3",
        "pq_ann_topk", "ivf_pq_topk", "quality_funnel_by_source",
        "simhash62_pairs", "contamination_slop1_indexed",
        "bm25_rank_top10", "bm25_index_top10", "bm25_batch_top5",
        "bm25_batch_indexed_top5", "hybrid_rrf_top10",
        "more_like_this_top10", "nb_quality_scores_src0",
        "temperature_mixture_weights", "weighted_sample_chars_k50",
        "kmeans_assign_k8_i2", "events_asof_attribution",
        "winnow_overlap_src0_src1", "bloom_decontaminate_src0",
        "bm25_filtered_top10", "bm25_filtered_indexed_top10",
        "bpe_train_roundtrip", "ivf_pq_rerank_top3",
        "more_like_this_indexed_top10", "ngram_spectrum_n2",
        "top_pmi_bigrams_k20", "hybrid_rrf_filtered_top10",
        "events_asof_nearest_click", "phrase_ac_counts",
        "topk_ngrams_by_source_n2_k5", "shared_span_coverage",
        "zipf_fit_unigrams", "url_dedup_keepfirst",
        "top_npmi_bigrams_k20", "remove_shared_spans_keepfirst",
        "decontaminate_ac_src0", "template_decontaminate_src0",
        "contamination_rate_indexed",
    ]
)


def test_new_headline_queries_have_scale_rows():
    from pathlib import Path

    import bench

    new = [n for n in bench.HEADLINE if n not in R12_HEADLINE]
    scale = (
        Path(__file__).resolve().parent.parent / "SCALE.md"
    ).read_text()
    missing = [n for n in new if n not in scale]
    assert not missing, (
        "headline additions need an isolated warm best-of-3 SCALE.md "
        f"row before joining the benched set: {missing}"
    )


def test_bench_detail_carries_loadavg_fields():
    """Round-over-round comparisons normalize for box load (the r12
    driver run recorded loadavg 10.3 and a uniform ~1.5x slowdown —
    load noise, not regression). The committed detail sidecar must
    carry BOTH loadavg fields so the same-box A/B reading stays
    possible, and the bench code must keep writing them (r12 VERDICT
    #8)."""
    import inspect
    import json
    from pathlib import Path

    import bench

    detail = json.loads(
        (
            Path(__file__).resolve().parent.parent / "BENCH_DETAIL.json"
        ).read_text()
    )
    assert "loadavg_start" in detail and "loadavg_end" in detail
    src = inspect.getsource(bench.main)
    assert '"loadavg_start"' in src and '"loadavg_end"' in src


def test_bench_session_silences_warn_chatter():
    """r13 VERDICT (bench log hygiene): the bench session must set the
    log level to ERROR right after creation, so the driver's ~2000-byte
    stdout tail carries the JSON line instead of WindowExec
    no-partition warnings (every such window is lint-verified bounded
    — tests/test_window_lint.py — so WARN there is pure noise). Pinned
    on the source so a refactor that drops the call fails here."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert 'setLogLevel("ERROR")' in src
    # the call must come before the first query/prepare work
    assert src.index("setLogLevel") < src.index("prepare_benchmark")
