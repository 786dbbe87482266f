"""C4-style cleaning pipeline walkthrough (the r12 text-quality surface).

The story: raw web-ish documents go through the classic C4 recipe
(Raffel et al. 2020 §2.2) — global three-sentence span dedup, then the
page filters — composed with the Gopher rules, and the result is
summarized with the one-command corpus datasheet. Every step is a
shuffle-light DataFrame transform; the whole pipeline is one linear
plan per stage.

Run: python examples/c4_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wimbd_spark import get_spark, load_tables
from wimbd_spark.operators.report import corpus_datasheet
from wimbd_spark.operators.textqc import (
    c4_quality_filter,
    c4_span_dedup,
    gopher_quality_filter,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="c4-pipeline-demo")
docs = load_tables(spark, sf_dir, names=["documents"])["documents"].filter(
    F.col("text").isNotNull()
)

print("== 1. global three-sentence span dedup ==")
deduped = c4_span_dedup(docs)
changed = (
    deduped.join(docs.select("doc_id", F.col("text").alias("_t0")), "doc_id")
    .filter("text <> _t0")
    .count()
)
print(f"{changed} documents lost at least one duplicated span")

print("\n== 2. C4 page filters (composable with Gopher) ==")
flagged = c4_quality_filter(deduped)
flagged.select(F.explode("drop_reasons").alias("rule")).groupBy(
    "rule"
).count().orderBy(F.desc("count")).show()
kept = flagged.filter("keep").drop("keep", "drop_reasons")
print(f"kept {kept.count()} / {docs.count()} after the C4 gate")
print("(the driver's synthetic docs have no terminal-punctuation lines,")
print(" so C4's line-retention rule — built for web pages — drops them;")
print(" the Gopher rules grade the same corpus on token statistics:)")
gopher_kept = gopher_quality_filter(
    flagged.drop("keep", "drop_reasons")
).filter("keep").drop("keep", "drop_reasons")
print(f"kept {gopher_kept.count()} after the Gopher gate instead")

print("\n== 3. datasheet over the cleaned corpus ==")
sheets = corpus_datasheet(
    gopher_kept, sections=("overview", "languages")
)
for sec, df in sheets.items():
    print(f"-- {sec}")
    print(df.toPandas().to_string(index=False))

spark.stop()
print("\ndone.")
