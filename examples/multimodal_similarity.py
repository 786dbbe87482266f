"""Multimodal + embedding-similarity walkthrough (the r7 surface).

The story: a corpus carries opaque binary payloads next to text and
embeddings. Sniff what the bytes are, decode them for real (no PIL —
the codecs are the engine's own), profile them into features, then do
similarity work on the embedding column: exact ANN as the oracle, the
persisted IVF index as the at-scale path, SemDeDup to drop
near-identical vectors.

Run: python examples/multimodal_similarity.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.operators.multimodal import (
    encode_baseline_jpeg,
    extract_features,
    sniff_media_meta,
)
from wimbd_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk,
    cosine_topk_ivf_indexed,
    semantic_duplicates,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="multimodal-similarity-demo")
t = load_tables(spark, sf_dir, names=["documents", "embeddings"])
docs, emb = t["documents"], t["embeddings"]

print("== 1. attach real image payloads (every 20th doc) ==")
# deterministic gradient JPEGs, dims derived from doc_id — built with
# the engine's own encoder, so no external codec is involved anywhere


def _payload(doc_id: int) -> bytes:
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    yy, xx = np.mgrid[0:h, 0:w]
    return encode_baseline_jpeg(
        (doc_id % 64 + yy * 7 + xx * 5).astype(np.uint8), quant=16
    )


ids = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 20 == 0)
       .select("doc_id").limit(50).collect()]
media = spark.createDataFrame(
    [(int(i), bytearray(_payload(int(i)))) for i in ids],
    "doc_id long, payload binary",
)

print("== 2. sniff headers (magic bytes -> format + dims) ==")
sniff_media_meta(media).orderBy("doc_id").show(5)

print("== 3. real decode -> luminance bucket profile ==")
# on_error='null' is the real-corpus mode: one alien payload must not
# abort the job
extract_features(
    media, dim=4, deterministic_fake=False, on_error="null"
).orderBy("doc_id").show(5, truncate=False)

print("== 4. exact ANN (the oracle) vs the persisted IVF index ==")
queries = emb.filter(F.col("vec_id") < 3)
exact = cosine_topk(emb, queries, k=3)
exact.show()
with tempfile.TemporaryDirectory() as d:
    path = f"{d}/ivf"
    build_ivf_index(emb, path, n_centroids=8)
    approx = cosine_topk_ivf_indexed(spark, path, queries, k=3, n_probe=2)
    hits = approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
    print(
        f"IVF recall@3 vs exact: {hits.count()}/{exact.count()} "
        f"(reads ~2/8 of the index per query — PartitionFilters)"
    )

print("== 5. SemDeDup: drop near-identical embeddings ==")
drops = semantic_duplicates(emb, threshold=0.45, n_centroids=8)
print(f"rows to drop at cosine>=0.45: {drops.count()}")
drops.orderBy("vec_id").show(5)

spark.stop()
