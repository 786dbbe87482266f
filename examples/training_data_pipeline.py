"""Training-data curation pipeline: foreign ingest → quality/repetition
filtering → exact + near dedup → eval-set decontamination → canonical
parquet. Every stage is a pure DataFrame transformation, so the whole
pipeline is ONE lazily-planned job per materialization.

Run: python examples/training_data_pipeline.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.corpus import load_tfrecords, standardize_corpus
from wimbd_spark.functions.text import tokenize
from wimbd_spark.operators.dedup import decontaminate, dedup_keep_first
from wimbd_spark.operators.neardup import ngram_jaccard_pairs
from wimbd_spark.operators.textqc import gopher_quality_filter
from wimbd_spark.sources.tfrecord import write_tfrecord

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="training-data-pipeline-demo")

print("== 1. ingest: TFRecord shards → canonical corpus ==")
tfdir = tempfile.mkdtemp()
write_tfrecord(
    f"{tfdir}/shard-0.tfrecord",
    [
        {"text": "fresh crawled document about spark joins", "url": "http://a"},
        {"text": "spam spam spam spam spam spam", "url": "http://b"},
    ],
)
crawled = standardize_corpus(
    load_tfrecords(spark, [tfdir]), text_field="text", source="crawl"
)
crawled.show(truncate=60)

print("== 2. main corpus + Gopher quality gate ==")
docs = load_tables(spark, sf_dir, names=["documents"])["documents"]
flagged = gopher_quality_filter(
    docs.select("doc_id", "text", "source"),
    # synthetic testdata docs are short — relax the published floors
    min_tokens=5, min_stopwords=0, min_mean_len=2.0,
)
flagged.filter(~F.col("keep")).select(
    F.explode("drop_reasons").alias("rule")
).groupBy("rule").count().show()
kept = flagged.filter("keep").drop("keep", "drop_reasons")
print(f"quality gate: {docs.count()} → {kept.count()} docs")

print("== 3. exact dedup (keep-first) ==")
deduped = dedup_keep_first(kept.select("doc_id", "text", "source"))
print(f"exact dedup: {kept.count()} → {deduped.count()} docs")

print("== 4. near-dup pairs to review (exact n-gram Jaccard) ==")
pairs = ngram_jaccard_pairs(deduped, shingle_n=3, threshold=0.5)
pairs.orderBy(F.desc("jaccard")).show(5)

print("== 5. decontaminate against an eval set ==")
evalset = docs.filter(F.col("source") == "src0").select("text").limit(50)
clean = decontaminate(deduped, evalset)
print(f"decontaminate: {deduped.count()} → {clean.count()} docs")

print("== 5b. FUZZY decontaminate (catches lightly-edited leaks) ==")
from wimbd_spark.operators.neardup import fuzzy_decontaminate

evaldocs = docs.filter(F.col("source") == "src0").select("doc_id", "text")
fuzzy_clean = fuzzy_decontaminate(clean, evaldocs, threshold=0.5)
print(f"fuzzy decontaminate: {clean.count()} → {fuzzy_clean.count()} docs")
clean = fuzzy_clean

print("== 5c. perplexity gate (CCNet-style, self-trained unigram LM) ==")
from wimbd_spark.operators.lm import lm_score, perplexity_filter, unigram_lm

lm = unigram_lm(docs)  # train on the full corpus, apply to the survivors
lm_score(clean, lm).orderBy(F.desc("ppl")).show(3)
clean = perplexity_filter(clean, max_ppl=40.0, lm=lm)
print(f"perplexity gate: kept {clean.count()} docs")

print("== 5d. bigram gate (CCNet fidelity: interpolated bigram LM) ==")
from wimbd_spark.operators.lm import bigram_lm, bigram_score

bi = bigram_lm(docs)  # the conditional half; `lm` above is the backoff
bigram_score(clean, lm, bi, lam=0.7).orderBy(F.desc("ppl")).show(3)
# (gate with bigram_perplexity_filter(clean, max_ppl=..., uni=lm, bi=bi))

print("== 6. source mixture: down/up-sample per source, epoch-tagged ==")
from wimbd_spark.operators.keycount import mixture_sample

mixed = mixture_sample(
    clean, {"src0": 0.5, "src1": 2.0}, keep_unlisted=True
)
mixed.groupBy("source").agg(
    F.countDistinct("doc_id").alias("docs"),
    F.count(F.lit(1)).alias("rows_after_mixture"),
).orderBy("source").show(5)

print("== 7. pack into 512-token training sequences ==")
from wimbd_spark.operators.packing import pack_documents, pack_stats

packed = pack_documents(
    mixed.withColumn(
        "doc_id", F.concat_ws(":", "doc_id", "mix_epoch")
    ),
    budget_tokens=512,
)
pack_stats(packed).orderBy("source", "pack_id").show(5)

out = tempfile.mkdtemp() + "/clean_corpus"
packed.write.mode("overwrite").parquet(out)
print(f"wrote curated+packed corpus → {out}")
spark.stop()
