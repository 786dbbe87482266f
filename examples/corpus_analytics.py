"""End-to-end corpus analytics walkthrough (the wimbd workflow on Spark).

Run: python examples/corpus_analytics.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.operators import (
    corpus_stats,
    count_sequences,
    dedup_keep_first,
    key_count,
    topk_ngrams,
    unique_ngrams,
)
from wimbd_spark.search import (
    count_documents_for_each_phrase,
    count_total_occurrences_of_unigrams,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="corpus-analytics-demo")
docs = load_tables(spark, sf_dir, names=["documents"])["documents"]

print("== corpus stats (wimbd stats) ==")
corpus_stats(docs, bytes_col="n_chars").show()

print("== top-10 trigrams (wimbd topk -n 3) ==")
topk_ngrams(docs, n=3, k=10).show(truncate=False)

print("== distinct bigrams (wimbd unique) ==")
unique_ngrams(docs, n=2).show()

print("== exact sequence counts (wimbd count -s ...) ==")
count_sequences(docs, ["table scan", "hash join"]).show()

print("== language distribution (key-count family) ==")
key_count(docs, "lang").show()

print("== ES-parity: per-phrase doc counts ==")
count_documents_for_each_phrase(docs, ["merge", ["table", "scan"]]).show()

print("== ES-parity: term frequencies ==")
count_total_occurrences_of_unigrams(docs, ["the", "scan"]).show()

print("== exact dedup (keep first) ==")
print("before:", docs.count(), "after:", dedup_keep_first(docs).count())

print("== posting-list index: phrase counts without a corpus scan ==")
import tempfile

from wimbd_spark.index import (
    build_phrase_index,
    count_documents_for_each_phrase_indexed,
    load_phrase_index,
)

idx_path = tempfile.mkdtemp(prefix="phraseidx_") + "/postings"
build_phrase_index(docs, idx_path)
idx = load_phrase_index(spark, idx_path)
count_documents_for_each_phrase_indexed(idx, ["merge", "table scan"]).show()

spark.stop()
