#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line for the driver.

Runs each headline query from __spark_entry__.queries() at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], timing full execution (noop sink — every
operator runs, nothing collected to the driver beyond agg results).

Output: one COMPACT final JSON line for the driver —
    {"metric": "...", "value": total_sec, "unit": "sec", "sf": float,
     "n_queries": N, "build_total_s": float, "build_warm_total_s": float}
kept well under the driver's 2000-byte tail capture (the r7 line grew
past it with 65 per-query timings and the driver recorded
parsed: null). Per-query timings + per-index build costs go to the
BENCH_DETAIL.json sidecar, committed alongside.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of SURVEY.md §2: ngram aggs (A7/A8/A9), scalar
# stats (A4), sequence/regex search (A5/A6), keycount family (A1),
# dedup joins (J2/J3/A11), ES-parity phrase surface (E4/E6/E7).
HEADLINE = [
    "topk_ngrams_n3_k20",
    "botk_ngrams_n1_k20",
    "unique_ngrams_n2",
    "count_sequences",
    "search_regex_counts",
    "corpus_stats",
    "lang_counts",
    "token_length_dist",
    "dedup_exact_keepfirst",
    "duplicate_stats_by_source",
    "decontaminate_src0",
    "phrase_doc_counts",
    "unigram_ttf",
    # relational + events
    "pricing_summary",
    "top_orders_by_revenue",
    "nation_revenue_europe",
    "events_tumbling_1h",
    "session_stats_30m_gap",
    # beyond-reference stack
    "lsh_neardup_pairs",
    "simhash16",
    "ann_cosine_topk",
    "quality_scores",
    "pii_extraction",
    # r2 additions (appended so r1 names keep their positions —
    # apples-to-apples round deltas): queries newly driver-checked
    "find_examples",
    "phrase_slop_count",
    "unique_ngrams_approx",
    "orders_rollup",
    "phrase_count_filtered",
    "top2_orders_per_customer",
    "ngram_jaccard_pairs",
    "repetition_scores",
    "embedding_cosine_pairs_lsh",
    # r3 additions
    "phrase_index_counts",
    "pack_documents_512",
    "mixture_sample",
    "neardup_cluster_dedup",
    # r4 additions. Index builds are timed SEPARATELY via
    # prepare_benchmark (reported as "build_s") — every indexed query
    # below measures query cost only, mirroring build-once/query-many.
    "phrase_batch_counts",
    "embedding_cosine_pairs_lsh_auto",
    "simhash62",
    # r5 additions
    "repeated_spans_k8",
    "pii_redaction",
    "dedup_paragraphs",
    "gram_overlap_src0_src1",
    "phrase_df_counts",
    "decontaminate_ngrams_src0",
    "contaminated_examples",
    "fuzzy_decontaminate_src0",
    "lm_ppl_scores",
    "domain_blocklist_filter",
    "tfidf_top3_terms",
    "vocab_stats_by_source",
    "gram_novelty_n4",
    "script_profile",
    "stratified_sample_k5",
    "search_snippets_w20",
    # r7 additions (index builds ride prepare_benchmark, so these are
    # query-cost-only like the phrase-index rows)
    "ivf_index_topk",
    "jpeg_decode_check",
    "topk_ngrams_2pass_n2_k20",
    "dsir_log_weights_src0",
    "unimax_mixture_weights",
    "quality_funnel_report",
    "cluster_balanced_sample_q3",
    # r8 additions
    "pq_ann_topk",
    "ivf_pq_topk",
    "quality_funnel_by_source",
    "simhash62_pairs",
    "contamination_slop1_indexed",
    # late-r8 additions (one representative per new family; doclens
    # build rides prepare_benchmark so bm25_index measures query only)
    "bm25_rank_top10",
    "bm25_index_top10",
    "bm25_batch_top5",
    "bm25_batch_indexed_top5",
    "hybrid_rrf_top10",
    "more_like_this_top10",
    "nb_quality_scores_src0",
    "temperature_mixture_weights",
    "weighted_sample_chars_k50",
    "kmeans_assign_k8_i2",
    "events_asof_attribution",
    "winnow_overlap_src0_src1",
    "bloom_decontaminate_src0",
    # r10 additions (filtered ranked retrieval, BPE training gated by
    # round-trip, two-stage ANN refine)
    "bm25_filtered_top10",
    "bm25_filtered_indexed_top10",
    "bpe_train_roundtrip",
    "ivf_pq_rerank_top3",
    "more_like_this_indexed_top10",
    "ngram_spectrum_n2",
    "top_pmi_bigrams_k20",
    "hybrid_rrf_filtered_top10",
    "events_asof_nearest_click",
    "phrase_ac_counts",
    "topk_ngrams_by_source_n2_k5",
    "shared_span_coverage",
    "zipf_fit_unigrams",
    "url_dedup_keepfirst",
    # r11 additions: collocation normalization, cross-doc span
    # surgery, AC-routed decontamination (trie-regex walker)
    "top_npmi_bigrams_k20",
    "remove_shared_spans_keepfirst",
    "decontaminate_ac_src0",
    # r12 additions (isolated warm best-of-3 measured < 2 s before
    # joining — bench-envelope rule, r11 VERDICT item 7)
    "template_decontaminate_src0",
    # heaviest queries LAST (r4 finding: the 240s pre-fix contamination
    # sweep inflated later queries ~2-5x via GC/cache pressure; keeping
    # heavy work at the tail isolates the shared prefix round-to-round)
    # r13 addition: corpus-as-queries bulk kNN (2000 queries x 2
    # probes against the IVF index; isolated warm best-of-3 2.6 s —
    # over the 2 s bar, so it rides the heavy tail; SCALE.md row)
    "knn_join_bulk_top2",
    "contamination_rate_indexed",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="wimbd-spark-bench")
    # Silence executor WARN chatter (log4j root level -> ERROR): the
    # driver's 2000-byte tail capture otherwise fills with WindowExec
    # no-partition warnings, every one of which is lint-verified
    # bounded (tests/test_window_lint.py) — noise, not signal.
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # cost-model variants benched but not driver-registered (their
    # correctness rides an oracle-gated registry twin)
    if hasattr(entrymod, "bench_only_queries"):
        qs.update(entrymod.bench_only_queries())
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n.startswith("bench_") and n not in HEADLINE
    ]

    # derived-index builds timed separately (reported as build_s) so
    # indexed queries measure query cost only
    build_s: dict[str, float] = {}
    if hasattr(entrymod, "prepare_benchmark"):
        try:
            build_s = entrymod.prepare_benchmark(spark, SF_DIR)
        except Exception as exc:  # visible, not fatal (ADVICE r7)
            print(f"prepare_benchmark failed: {exc!r}", file=sys.stderr)
            build_s = {"error": -1.0}

    # JMH-style warmup: run every query once at the smallest SF so the
    # timed pass measures steady-state execution (expression codegen is
    # session-cached), not first-call compilation — compile cost is
    # irrelevant at the 100 TB design point.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # warmup is best-effort

    # best-of-2 per query, INTERLEAVED passes: local[32] on a shared
    # box is noisy. Back-to-back repeats (the r8 form) still inflate a
    # query whose contention burst spans both runs — the r8/r9 driver
    # records of IDENTICAL code differed 1.46x in-sequence. Running
    # pass 1 over every query, then pass 2, means a burst must span
    # the WHOLE bench to survive the per-query min.
    try:
        load_start = round(os.getloadavg()[0], 1)
    except OSError:
        load_start = -1.0
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < timings.get(name, float("inf")):
                timings[name] = round(dt, 4)

    # warm rebuild AFTER the timed pass (so it cannot perturb query
    # timings): build_s absorbs the first-job JVM constant and varies
    # 6-13s with machine state; build_warm_s is the steady-state build
    # cost — the mechanically comparable round-over-round number
    build_warm_s: dict[str, float] = {}
    if hasattr(entrymod, "prepare_benchmark_warm"):
        try:
            build_warm_s = entrymod.prepare_benchmark_warm(spark, SF_DIR)
        except Exception as exc:  # visible, not fatal (ADVICE r7)
            print(
                f"prepare_benchmark_warm failed: {exc!r}", file=sys.stderr
            )
            build_warm_s = {"error": -1.0}

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    try:  # machine-state context for round-over-round comparison
        load1 = round(os.getloadavg()[0], 1)
    except OSError:
        load1 = -1.0
    # per-query detail to a sidecar; the driver only tail-captures the
    # last ~2000 bytes of stdout, so the FINAL line must stay compact
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "build_s": build_s,
        "build_warm_s": build_warm_s,
        "sf": sf,
        "loadavg_start": load_start,
        "loadavg_end": load1,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(final_line(timings, build_s, build_warm_s, sf, load1))
    spark.stop()


def final_line(
    timings: dict[str, float],
    build_s: dict[str, float],
    build_warm_s: dict[str, float],
    sf: float,
    loadavg: float = -1.0,
) -> str:
    """The ONE driver-parsed stdout line. Fixed-width by construction
    (no per-query keys), so it stays under the driver's 2000-byte tail
    capture at any query count — the r7 regression was per-query
    timings pushing the line past the capture (BENCH_r07 parsed:null).
    """
    compact = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        # the bench-envelope contract (r11 VERDICT item 7): headline
        # count AND per-query average are first-class reported numbers,
        # so round-over-round comparisons normalize for a growing set
        "per_query_avg_s": round(
            sum(timings.values()) / len(timings), 4
        )
        if timings
        else 0.0,
        "build_total_s": round(
            sum(v for v in build_s.values() if v >= 0), 4
        ),
        "build_warm_total_s": round(
            sum(v for v in build_warm_s.values() if v >= 0), 4
        ),
        "loadavg": loadavg,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    assert (
        len(line) < 1500
    ), f"driver contract: final line too long ({len(line)}B)"
    return line


if __name__ == "__main__":
    main()
