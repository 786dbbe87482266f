"""Near-duplicate detection pipeline: MinHash-LSH with Jaccard verify,
SimHash pairs, and embedding-cosine neighbors.

Run: python examples/neardup_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.operators import (
    cosine_topk,
    minhash_dedup_pairs,
    simhash_pairs,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="neardup-demo")
t = load_tables(spark, sf_dir, names=["documents", "embeddings"])
docs, emb = t["documents"], t["embeddings"]

# plant some near-duplicates so the demo has positives
mutated = docs.select(
    (F.col("doc_id") + 10**6).alias("doc_id"),
    F.regexp_replace("text", r"^\S+\s*", "").alias("text"),
)
corpus = docs.select("doc_id", "text").unionAll(mutated)

print("== MinHash-LSH near-dup pairs (jaccard >= 0.5) ==")
pairs = minhash_dedup_pairs(corpus, threshold=0.5)
pairs.orderBy(F.desc("jaccard")).show(10)
print("total pairs:", pairs.count())

print("== SimHash pairs (hamming <= 2) ==")
simhash_pairs(corpus, max_hamming=2).show(5)

print("== embedding cosine top-3 neighbors for 5 query vectors ==")
cosine_topk(emb, emb.filter("vec_id < 5"), k=3).orderBy(
    "query_id", "rank"
).show()

print("== pair→cluster resolution: keep one representative per cluster ==")
from wimbd_spark.operators.neardup import drop_near_duplicates

kept = drop_near_duplicates(corpus, pairs)
print(f"cluster dedup: {corpus.count()} → {kept.count()} docs")

print("== streaming ingest gate: new docs near-dup'ing the kept corpus are dropped ==")
import json
import os
import tempfile

from wimbd_spark.streaming import (
    read_doc_stream,
    reference_band_table,
    streaming_neardup_filter,
)

bands = reference_band_table(kept)
d = tempfile.mkdtemp(prefix="ingest_")
sample = kept.select("text").first()["text"]
with open(os.path.join(d, "b0.json"), "w") as f:
    f.write(json.dumps({"doc_id": 1, "ts": "2024-01-01T00:00:00.000Z",
                        "text": sample, "source": "crawl"}) + "\n")
    f.write(json.dumps({"doc_id": 2, "ts": "2024-01-01T00:00:00.000Z",
                        "text": "genuinely novel text never seen before xyzzy",
                        "source": "crawl"}) + "\n")
q = (
    streaming_neardup_filter(read_doc_stream(spark, d), bands)
    .writeStream.foreachBatch(
        lambda df, _e: print(
            "kept from micro-batch:",
            [r["doc_id"] for r in df.collect()],
        )
    )
    .start()
)
q.processAllAvailable()
q.stop()

spark.stop()
