#!/usr/bin/env python
"""Measure ANN recall@k against exact cosine top-k (VERDICT r9 item 7).

For each approximate variant, recall@k = |approx_topk ∩ exact_topk| / k
averaged over the query set (the standard ANN-benchmarks definition).
Variants are run at BOTH their registry parameterization (tiny, chosen
for oracle-checkability at sf0.01) and the documented at-scale
defaults, so the table shows what the parameters buy.

Usage: python tools/measure_recall.py [sf_dir] [n_queries] [k]
Prints one markdown table row per (variant, params) for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 50
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main():
    from pyspark.sql import functions as F

    from wimbd_spark import get_spark
    from wimbd_spark.operators.similarity import (
        auto_nbits,
        auto_ncentroids,
        build_ivf_index,
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_ivf_indexed,
        cosine_topk_ivf_pq_indexed,
        cosine_topk_ivf_pq_rerank,
        cosine_topk_lsh,
        cosine_topk_pq,
    )

    spark = get_spark(app_name="recall", master="local[8]",
                      shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_rows = emb.count()
    qids = [
        r.vec_id
        for r in emb.select("vec_id").orderBy("vec_id").limit(N_QUERIES).collect()
    ]
    queries = emb.filter(F.col("vec_id").isin(qids))

    def topk_sets(df) -> dict:
        out: dict = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = topk_sets(cosine_topk(emb, queries, k=K))

    def recall(df) -> float:
        approx = topk_sets(df)
        tot, denom = 0, 0
        for q, ex in exact.items():
            tot += len(approx.get(q, set()) & ex)
            denom += len(ex)
        return tot / denom if denom else float("nan")

    nbits_auto = auto_nbits(n_rows)
    ncent_auto = auto_ncentroids(n_rows)
    probe_auto = max(2, ncent_auto // 4)

    # key the temp indexes by sf_dir: concurrent runs over different
    # scales must not overwrite each other's index mid-query
    import hashlib

    tag = hashlib.md5(SF_DIR.encode()).hexdigest()[:8]
    ivf_small = os.path.join(tempfile.gettempdir(), f"recall_ivf8_{tag}")
    ivf_auto = os.path.join(tempfile.gettempdir(), f"recall_ivfauto_{tag}")
    build_ivf_index(emb, ivf_small, n_centroids=8, pq_m=8, pq_codes=16)
    if os.environ.get("RECALL_SKIP_SLOW") != "1":
        build_ivf_index(
            emb, ivf_auto, n_centroids=ncent_auto, pq_m=8, pq_codes=256
        )

    skip_slow = os.environ.get("RECALL_SKIP_SLOW") == "1"

    def lsh_at(nb):
        return lambda: cosine_topk_lsh(emb, queries, k=K, nbits=nb,
                                       dim=None)

    def ivf_at(nc, np_):
        return lambda: cosine_topk_ivf(emb, queries, k=K, n_centroids=nc,
                                       n_probe=np_)

    variants = [
        (f"LSH multiprobe nbits=auto({nbits_auto})", lsh_at(nbits_auto)),
        *[(f"LSH multiprobe nbits={nb}", lsh_at(nb)) for nb in (2, 4, 6, 8)
          if nb != nbits_auto],
        ("IVF n_centroids=8 n_probe=2 (registry)", ivf_at(8, 2)),
        *[(f"IVF n_centroids=16 n_probe={np_}", ivf_at(16, np_))
          for np_ in (1, 2, 4, 8)],
        (f"IVF n_centroids=auto({ncent_auto}) n_probe={probe_auto}",
         ivf_at(ncent_auto, probe_auto)),
        ("PQ m=8 n_codes=16 (registry)",
         lambda: cosine_topk_pq(emb, queries, k=K, m=8, n_codes=16)),
        ("PQ m=16 n_codes=16",
         lambda: cosine_topk_pq(emb, queries, k=K, m=16, n_codes=16)),
        ("IVF-idx n_centroids=8 n_probe=2 (registry)",
         lambda: cosine_topk_ivf_indexed(spark, ivf_small, queries, k=K,
                                         n_probe=2)),
        ("IVF-PQ-idx nc=8 n_probe=2 m=8 codes=16 (registry)",
         lambda: cosine_topk_ivf_pq_indexed(spark, ivf_small, queries,
                                            k=K, n_probe=2)),
        ("IVF-PQ-rerank nc=8 n_probe=2 cand=10k (exact refine)",
         lambda: cosine_topk_ivf_pq_rerank(spark, ivf_small, queries,
                                           k=K, n_candidates=10 * K,
                                           n_probe=2)),
    ]
    if not skip_slow:
        variants += [
            ("PQ m=8 n_codes=256 iters=2 (Lloyd-refined)",
             lambda: cosine_topk_pq(emb, queries, k=K, m=8, n_codes=256,
                                    iters=2)),
            (f"IVF-PQ-idx nc={ncent_auto} n_probe={probe_auto} "
             "m=8 codes=256",
             lambda: cosine_topk_ivf_pq_indexed(spark, ivf_auto, queries,
                                                k=K, n_probe=probe_auto)),
        ]

    print(f"# sf_dir={SF_DIR} n_vectors={n_rows} "
          f"n_queries={len(exact)} k={K}")
    print("| variant | recall@k | query s |")
    print("|---|---|---|")
    for name, fn in variants:
        t0 = time.time()
        r = recall(fn())
        dt = time.time() - t0
        print(f"| {name} | {r:.3f} | {dt:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
