"""Eval-set decontamination workflow, end to end (the r5 surface).

The story a training-data team runs before every release:
  1. build the posting index for the training corpus (once);
  2. SWEEP — what fraction of the eval set leaks into training?
  3. PROFILE — per-phrase doc counts and corpus-level overlap;
  4. AUDIT — example documents for each leaked phrase;
  5. ENFORCE — drop the contaminated training docs (batch), and gate
     newly ingested docs the same way (streaming twin, not run here —
     see streaming_demo.py).

The eval set stays a DataFrame through every step: no phrase list
ever reaches the driver, so the same code serves a 40-phrase demo and
a 10^6-phrase production sweep.

Run: python examples/decontamination_workflow.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.functions.text import ngram_strings, tokenize
from wimbd_spark.index import (
    build_phrase_index,
    contaminated_examples,
    count_documents_for_each_phrase_df,
    load_phrase_index,
)
from wimbd_spark.operators.compare import gram_overlap
from wimbd_spark.operators.dedup import (
    contamination_report,
    decontaminate_by_ngrams,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="decontamination-workflow")
docs = load_tables(spark, sf_dir, names=["documents"])["documents"]

# the "eval set": every distinct 4-gram of src0; the "training
# corpus": everything else
evalset = (
    docs.filter(F.col("source") == "src0")
    .select(F.explode(ngram_strings(tokenize(F.col("text")), 4)).alias("phrase"))
    .distinct()
)
train = docs.filter(F.col("source") != "src0")

print("== 1. index the training corpus (build once, query many) ==")
idx_path = tempfile.mkdtemp() + "/postings"
build_phrase_index(train, idx_path)
idx = load_phrase_index(spark, idx_path)

print("== 2. contamination sweep (distributed gram semi-join) ==")
contamination_report(evalset, "phrase", index=idx).show()

print("== 3a. per-phrase doc counts (top 5 leakiest phrases) ==")
counts = count_documents_for_each_phrase_df(idx, evalset)
counts.orderBy(F.desc("count"), "phrase").show(5, truncate=False)

print("== 3b. corpus-level overlap profile (src0 vs src1 bigrams) ==")
gram_overlap(docs, "src0", "src1", n=2).show()

print("== 4. audit: example docs for each leaked phrase ==")
contaminated_examples(idx, evalset, k=2).orderBy("phrase", "rank").show(
    6, truncate=False
)

print("== 5. enforce: drop contaminated training docs ==")
before = train.count()
clean = decontaminate_by_ngrams(train, evalset)
after = clean.count()
print(f"train docs: {before} -> {after} ({before - after} dropped)")

print("== 6. slop: windowed matching (r8 — eval tokens in order")
print("   within a window of len+slop, still fully distributed) ==")
contamination_report(evalset, "phrase", index=idx, slop=1).show()
slop_after = decontaminate_by_ngrams(train, evalset, slop=1).count()
print(
    f"slop=1 widens the drop set: {before - after} -> "
    f"{before - slop_after} docs dropped"
)

spark.stop()

# -- r10 additions -----------------------------------------------------
# Re-create the session (the walkthrough above stopped it) to show the
# two r10 paths: the index-free Aho-Corasick batch (tens of thousands
# of eval phrases, ONE document pass, per-doc cost independent of the
# phrase count) and URL-level dedup (C4 convention) as a pre-step.
from wimbd_spark import get_spark as _get_spark  # noqa: E402

spark = _get_spark(app_name="decontamination-demo-r10")
train = load_tables(spark, sf_dir, names=["documents"])["documents"]
phrases = [r.phrase for r in spark.createDataFrame(
    [(p,) for p in ["table scan", "merge join", "no such phrase"]],
    ["phrase"],
).collect()]

print("== 7. index-free many-phrase batch (Aho-Corasick, r10) ==")
from wimbd_spark.search import count_documents_for_each_phrase  # noqa: E402

# method='auto' routes >=32-phrase plain batches to the automaton;
# force it here to demo on a small list
count_documents_for_each_phrase(train, phrases, method="ac").show()

print("== 8. URL-level dedup before text dedup (C4 convention) ==")
from pyspark.sql import functions as F  # noqa: E402

from wimbd_spark.functions.text import url_normalize  # noqa: E402
from wimbd_spark.operators.dedup import dedup_keep_first  # noqa: E402

with_url = train.withColumn(
    "url",
    F.concat(F.lit("https://www."), F.col("source"),
             F.lit(".com/p/"), (F.col("doc_id") % 100).cast("string"),
             F.when(F.col("doc_id") % 2 == 0, "?utm_source=x")
             .otherwise("#frag")),
)
kept = dedup_keep_first(with_url, key=url_normalize(F.col("url")))
print(f"url dedup: {with_url.count()} -> {kept.count()}")
spark.stop()
