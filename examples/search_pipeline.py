"""Search tier, end to end — the ES workflow without the ES cluster.

What an index user runs against a corpus, in the order they'd run it:
  1. build the posting-list index once (`index-build`), plus the
     BM25 doc-length sidecar;
  2. COUNT — phrase doc-counts from postings (no corpus scan);
  3. RANK — BM25 top-k for a term query, scan path vs indexed path
     (same scores by construction);
  4. EXPLORE — more_like_this: expand from one interesting document
     to its nearest relevance neighbors;
  5. HYBRID — fuse the BM25 list with a dense embedding list via
     Reciprocal Rank Fusion (the standard sparse+dense combiner).

Run: python examples/search_pipeline.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from wimbd_spark import get_spark, load_tables
from wimbd_spark.index import (
    build_phrase_index,
    count_documents_for_each_phrase_indexed,
    load_phrase_index,
)
from wimbd_spark.operators.bm25 import (
    bm25_topk,
    bm25_topk_indexed,
    build_doclen_stats,
    more_like_this,
)
from wimbd_spark.operators.fusion import hybrid_search

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="search-pipeline")
t = load_tables(spark, sf_dir, names=["documents", "embeddings"])
docs, emb = t["documents"], t["embeddings"]

# 1. build once --------------------------------------------------------
idx = tempfile.mkdtemp(prefix="search_idx_")
build_phrase_index(docs, idx)
build_doclen_stats(spark, idx)  # BM25 corpus stats, build-once too

# 2. count: postings only, corpus never scanned ------------------------
print("== per-phrase doc counts (indexed) ==")
count_documents_for_each_phrase_indexed(
    load_phrase_index(spark, idx), ["table scan", "hash join"]
).show()

QUERY = "table scan fast query"

# 3. rank: scan vs indexed, identical rows -----------------------------
print(f"== BM25 top-5 for {QUERY!r} (scan path) ==")
bm25_topk(docs, QUERY, k=5).show()
print("== same, answered from postings + _doclens ==")
bm25_topk_indexed(spark, idx, QUERY, k=5).show()

# 4. explore: relevance neighbors of one document ----------------------
anchor = 42
print(f"== more_like_this(doc {anchor}) ==")
more_like_this(docs, anchor, k=5).show()

# 5. hybrid: BM25 + dense cosine via RRF -------------------------------
print("== hybrid RRF (sparse BM25 + dense cosine of vec 0) ==")
hybrid_search(docs, emb, QUERY, query_vec_id=0, k=5).show()

spark.stop()
print("search pipeline complete")
