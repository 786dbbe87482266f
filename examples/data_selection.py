"""Data-selection walkthrough: funnel audit → quality classifier →
DSIR target-matching → UniMax/temperature budget allocation →
mixture materialization.

The four stages answer the four questions a curation run asks, in
order: (1) where do documents drop out of my cleaning pipeline?
(2) which survivors look most like my high-quality target corpus?
(3) how should a fixed token budget spread across sources without
over-repeating any of them? (4) materialize that mixture.

Run: python examples/data_selection.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.operators.dsir import dsir_log_weights, dsir_top_fraction
from wimbd_spark.operators.funnel import quality_funnel
from wimbd_spark.operators.keycount import mixture_sample
from wimbd_spark.operators.mixture import unimax_allocation

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="data-selection-demo")
docs = load_tables(spark, sf_dir, names=["documents"])["documents"]

print("== 1. funnel: where do documents go? ==")
quality_funnel(docs, min_tokens=3, max_tokens=10_000).orderBy("stage").show()

print("== 2a. NB quality classifier: train pos-vs-pool, score ==")
# pretend src0 is the curated high-quality target
target = docs.filter(F.col("source") == "src0")
from wimbd_spark.operators.classifier import fit_nb_classifier, nb_score

model = fit_nb_classifier(target, docs)
nb_score(docs, model).orderBy(F.desc("score")).show(5)

print("== 2b. DSIR: score the pool against the same target ==")
weights = dsir_log_weights(docs, target, buckets=4096)
weights.orderBy(F.desc("log_weight")).show(5)
selected = dsir_top_fraction(weights, fraction=0.25)
print(f"selected top 25%: {selected.count()} docs")

print("== 3. UniMax: spread a 50k-token budget, max 2 epochs/source ==")
alloc = unimax_allocation(docs, budget_tokens=50_000, max_epochs=2.0)
alloc.orderBy(F.desc("alloc")).show(10)

print("== 3b. or the smooth form: temperature sampling (alpha=0.3) ==")
from wimbd_spark.operators.mixture import temperature_allocation

temperature_allocation(docs, alpha=0.3).orderBy(F.desc("weight")).show(5)

print("== 4. materialize the mixture with the UniMax weights ==")
w = {r["source"]: r["weight"] for r in alloc.collect()}
total = sum(w.values()) or 1.0
norm = {s: v / total for s, v in w.items()}
mixture = mixture_sample(docs, norm, key="doc_id", group_col="source")
mixture.groupBy("source").count().orderBy(F.desc("count")).show(5)

spark.stop()
