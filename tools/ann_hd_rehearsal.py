#!/usr/bin/env python
"""Production-dim ANN rehearsal (r13 VERDICT item 4).

SCALE.md r13 left the PQ story with an open claim: at 64 dims the
codes-only path LOSES to exact scoring (the uvec rows are small enough
that full-precision reads cost nothing), and the crossover "needs
production dims and real IO". This script measures that claim on the
``embeddings_hd.parquet`` table (``python tools/make_sf1.py --hd`` —
default 200k × 256-dim, clustered):

- bulk corpus-as-queries: `knn_join` (exact uvec scoring) vs
  `knn_join_pq` (codes-only stage 1 + exact join re-rank), Q query
  rows against the full corpus, k=3;
- interactive: `cosine_topk_ivf_indexed` (exact) vs
  `cosine_topk_ivf_pq_rerank` (rerank="join") on a 16-query set;
- recall of the PQ candidates vs the exact top-k (same-parameter
  ground truth), so a speed win can't hide a quality loss.

Prints a markdown table for SCALE.md. Warm best-of-N wall times, one
shared session, indexes built once outside the timed region.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HD = os.environ.get("SF1_HD_PATH", "/tmp/sf1/embeddings_hd.parquet")
IDX = os.environ.get("SF1_HD_INDEX", "/tmp/sf1/ivf_hd_index")
Q_ROWS = int(os.environ.get("HD_Q_ROWS", "2000"))
K = 3
N_PROBE = 4
N_CENTROIDS = 64
PQ_M = int(os.environ.get("HD_PQ_M", "32"))
PQ_CODES = int(os.environ.get("HD_PQ_CODES", "16"))
REPS = int(os.environ.get("HD_REPS", "3"))


def best_of(fn, reps=REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from wimbd_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf_indexed,
        cosine_topk_ivf_pq_rerank,
        knn_join,
        knn_join_pq,
    )
    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="ann-hd-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(HD)
    n, dim = emb.count(), len(emb.select("embedding").head()[0])
    print(f"corpus: {n} rows × {dim} dims")

    t0 = time.time()
    if not os.path.exists(IDX):
        build_ivf_index(
            emb, IDX, n_centroids=N_CENTROIDS, pq_m=PQ_M, pq_codes=PQ_CODES
        )
        print(f"index build (ivf+pq): {time.time() - t0:.1f}s")

    queries = emb.filter(F.col("vec_id") < Q_ROWS).cache()
    queries.count()

    def run_exact():
        knn_join(
            spark, IDX, queries, k=K, n_probe=N_PROBE
        ).groupBy().count().collect()

    def run_pq():
        knn_join_pq(
            spark, IDX, queries, k=K, n_probe=N_PROBE
        ).groupBy().count().collect()

    t_exact = best_of(run_exact)
    t_pq = best_of(run_pq)

    # candidate recall: PQ top-k vs exact top-k at equal params
    exact_rows = knn_join(
        spark, IDX, queries, k=K, n_probe=N_PROBE
    ).collect()
    pq_rows = knn_join_pq(
        spark, IDX, queries, k=K, n_probe=N_PROBE
    ).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    got = {(r["query_id"], r["neighbor_id"]) for r in pq_rows}
    recall = len(truth & got) / max(len(truth), 1)

    small = emb.filter(F.col("vec_id") < 16)
    t_inter_exact = best_of(
        lambda: cosine_topk_ivf_indexed(
            spark, IDX, small, k=K, n_probe=N_PROBE
        ).collect()
    )
    t_inter_pq = best_of(
        lambda: cosine_topk_ivf_pq_rerank(
            spark, IDX, small, k=K, n_probe=N_PROBE, rerank="join"
        ).collect()
    )

    print()
    print(f"| shape ({n}×{dim}, k={K}, n_probe={N_PROBE}, pq {PQ_M}x{PQ_CODES}) | exact | pq | pq/exact |")
    print("|---|---|---|---|")
    print(
        f"| bulk knn_join, {Q_ROWS} queries | {t_exact:.1f}s "
        f"| {t_pq:.1f}s | {t_pq / t_exact:.2f} |"
    )
    print(
        f"| interactive top-k, 16 queries | {t_inter_exact:.1f}s "
        f"| {t_inter_pq:.1f}s | {t_inter_pq / t_inter_exact:.2f} |"
    )
    print(f"| PQ-rerank top-{K} recall vs exact | | | {recall:.4f} |")
    spark.stop()


if __name__ == "__main__":
    main()
