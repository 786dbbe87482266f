"""Vector-index lifecycle walkthrough (the r12 surface).

The story: a production ANN index is never static — vectors stream in
while queries run, the ingest distribution drifts, and the index has
to be maintained without downtime. The engine's cycle:

    build   → base generation (centroid-partitioned lists, PQ codes)
    ingest  → streaming delta tier, exactly-once per micro-batch
    query   → base ∪ delta transparently, k-fill under filters
    absorb  → fold delta into a fresh partition-pruned generation
    drift   → needs_recluster trips on list-size skew
    recluster → k-means re-fit, fresh generation, PQ codebooks re-fit

Run: python examples/vector_index_lifecycle.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.operators.similarity import (
    absorb_ivf_delta,
    build_ivf_index,
    cosine_topk_ivf_indexed,
    cosine_topk_ivf_pq_indexed,
    ivf_list_sizes,
    needs_recluster,
    recluster_ivf_index,
)
from wimbd_spark.streaming.vectors import (
    read_vector_stream,
    streaming_ivf_ingest,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="vector-lifecycle-demo")
emb = load_tables(spark, sf_dir, names=["embeddings"])["embeddings"]
root = tempfile.mkdtemp(prefix="ivf_lifecycle_")
idx = f"{root}/gen1"

print("== 1. build the base generation (with PQ codes) ==")
seed = emb.filter(F.col("vec_id") % 2 == 0)
build_ivf_index(seed, idx, n_centroids=16, pq_m=4, pq_codes=16)
print(ivf_list_sizes(spark, idx).limit(5).toPandas().to_string(index=False))

print("\n== 2. stream the other half in as micro-batches ==")
feed = f"{root}/feed"
emb.filter(F.col("vec_id") % 2 == 1).repartition(4).write.parquet(feed)
q = streaming_ivf_ingest(
    read_vector_stream(spark, feed, max_files_per_trigger=1),
    idx,
    checkpoint=f"{root}/ckpt",
)
q.processAllAvailable()
q.stop()
total = sum(r["size"] for r in ivf_list_sizes(spark, idx).collect())
print(f"index now holds {total} vectors (= corpus {emb.count()})")

print("\n== 3. query base ∪ delta — plain, PQ, and filtered k-fill ==")
queries = emb.filter(F.col("vec_id") < 3)
print("plain probes:")
print(
    cosine_topk_ivf_indexed(spark, idx, queries, k=3, n_probe=4)
    .toPandas().to_string(index=False)
)
print("PQ codes-only probes:")
print(
    cosine_topk_ivf_pq_indexed(spark, idx, queries, k=3, n_probe=4)
    .toPandas().to_string(index=False)
)
# a tight allowlist that starves n_probe=1 — k-fill escalates
allow = emb.filter(F.col("vec_id").between(400, 420)).select("vec_id")
print("filtered + k-fill (allowlist of 21 ids, n_probe=1):")
print(
    cosine_topk_ivf_indexed(
        spark, idx, queries, k=3, n_probe=1, candidates=allow, k_fill=True
    ).toPandas().to_string(index=False)
)

print("\n== 4. absorb the delta into a fresh generation ==")
gen2 = f"{root}/gen2"
absorb_ivf_delta(spark, idx, gen2)
print(f"gen2 single-tier: {sum(r['size'] for r in ivf_list_sizes(spark, gen2).collect())} vectors")

print("\n== 5. drift check → recluster ==")
print("needs_recluster(gen2):", needs_recluster(spark, gen2, min_rows=1))
gen3 = f"{root}/gen3"
recluster_ivf_index(spark, gen2, gen3, n_centroids=16, n_iter=2)
sizes = ivf_list_sizes(spark, gen3).collect()
print(
    f"gen3 after k-means re-fit: {len(sizes)} lists, "
    f"max={max(r['size'] for r in sizes)}, "
    f"mean={sum(r['size'] for r in sizes) / len(sizes):.0f}"
)
print("full-probe answers are generation-invariant:",
      sorted(map(tuple, cosine_topk_ivf_indexed(
          spark, gen2, queries, k=3, n_probe=16).collect()))
      == sorted(map(tuple, cosine_topk_ivf_indexed(
          spark, gen3, queries, k=3, n_probe=16).collect())))

print("\n== 6. bulk tier: corpus-as-queries against the fresh index ==")
from wimbd_spark.operators.similarity import (  # noqa: E402
    knn_join,
    knn_join_pq,
    semantic_duplicates_ivf,
)

# every corpus vector -> its 2 nearest neighbors; nothing on the
# driver but the centroid table (plan-pinned in tests/test_plans.py)
bulk = knn_join(spark, gen3, emb, k=2, n_probe=4)
print(f"knn_join rows: {bulk.count()} (= 2 x corpus, minus starved)")
# codes-only stage 1 (gen3 kept its PQ sidecar through the rebuild)
bulk_pq = knn_join_pq(spark, gen3, emb, k=2, n_probe=4)
print(f"knn_join_pq rows: {bulk_pq.count()}")
# bulk SemDeDup: drop vectors with a smaller-id 0.99-neighbor in
# their probed lists; keep the rest with one anti-join
drops = semantic_duplicates_ivf(spark, gen3, emb, threshold=0.99, n_probe=4)
kept = emb.join(drops, "vec_id", "left_anti")
print(f"semantic dedup at 0.99: dropped {drops.count()}, kept {kept.count()}")

spark.stop()
print("\ndone.")
