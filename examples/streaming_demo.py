"""Structured Streaming demo: event files arriving as micro-batches →
watermarked tumbling counts + session windows, printed per trigger;
then an incrementally-maintained phrase index with generation
compaction.

Run: python examples/streaming_demo.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from wimbd_spark import get_spark
from wimbd_spark.streaming import (
    read_event_stream,
    session_window_stream,
    tumbling_counts_stream,
)

spark = get_spark(app_name="streaming-demo")
d = tempfile.mkdtemp(prefix="events_")


def feed(name, events):
    with open(os.path.join(d, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def ev(i, minute, user, etype="click"):
    return {
        "event_id": i,
        "ts": f"2024-01-01T00:{minute:02d}:00.000Z",
        "user_id": user,
        "event_type": etype,
        "value": 1.0,
        "props": "{}",
    }


feed("b0.json", [ev(1, 0, 1), ev(2, 10, 1, "view"), ev(3, 45, 2)])

events = read_event_stream(spark, d, max_files_per_trigger=1)
q1 = (
    tumbling_counts_stream(events, duration="30 minutes")
    .writeStream.format("console")
    .outputMode("update")
    .start()
)
q2 = (
    session_window_stream(events, gap="30 minutes")
    .writeStream.format("console")
    .outputMode("complete")
    .start()
)
q1.processAllAvailable()
q2.processAllAvailable()

print(">>> feeding a late micro-batch")
feed("b1.json", [ev(4, 12, 1), ev(5, 50, 2, "purchase")])
q1.processAllAvailable()
q2.processAllAvailable()

q1.stop()
q2.stop()

# --- incrementally-maintained phrase index + compaction cycle -------
from wimbd_spark.index import (  # noqa: E402
    compact_phrase_index,
    count_documents_for_each_phrase_indexed,
    load_phrase_index,
    needs_compaction,
    streaming_phrase_index,
)
from wimbd_spark.streaming import read_doc_stream  # noqa: E402

docs_dir = tempfile.mkdtemp(prefix="docs_")
idx_path = os.path.join(tempfile.mkdtemp(prefix="idx_"), "gen1")


def feed_docs(name, docs):
    with open(os.path.join(docs_dir, name), "w") as f:
        for i, text in docs:
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")


feed_docs("d0.json", [(1, "spark streaming index demo")])
qi = streaming_phrase_index(
    read_doc_stream(spark, docs_dir),
    idx_path,
    os.path.join(tempfile.mkdtemp(prefix="ckpt_"), "c"),
    num_files=2,
)
qi.processAllAvailable()
for b in range(1, 5):  # more micro-batches → more index generations
    feed_docs(f"d{b}.json", [(b + 1, f"streaming doc number {b}")])
    qi.processAllAvailable()
qi.stop()

print(">>> counts from the streamed index")
count_documents_for_each_phrase_indexed(
    load_phrase_index(spark, idx_path), ["streaming", "spark"]
).show()

# the maintenance cycle: compact into a FRESH generation when the
# per-batch file growth trips the trigger, then repoint readers
if needs_compaction(spark, idx_path, num_files=2, factor=1):
    gen2 = idx_path.replace("gen1", "gen2")
    compact_phrase_index(spark, idx_path, gen2, num_files=2)
    print(f">>> compacted {idx_path} -> {gen2}; identical answers:")
    count_documents_for_each_phrase_indexed(
        load_phrase_index(spark, gen2), ["streaming", "spark"]
    ).show()


print(">>> cleaning gates on ingest: funnel -> DSIR selection -> dedup")
from pyspark.sql import functions as F

from wimbd_spark.operators.dsir import fit_log_ratio, hashed_feature_counts
from wimbd_spark.streaming import (
    dsir_map_table,
    read_doc_stream,
    streaming_dedup_exact,
    streaming_dsir_gate,
    streaming_funnel_gate,
)

dd = tempfile.mkdtemp(prefix="docs_")


def feed_doc(name, rows):
    with open(os.path.join(dd, name), "w") as f:
        for i, text in rows:
            f.write(json.dumps({
                "doc_id": i, "ts": "2024-01-01T00:00:00.000Z",
                "text": text, "source": "crawl",
            }) + "\n")


# static DSIR model: target = what good docs look like; raw = a crawl
# snapshot (models fit OFFLINE, folded to a one-row broadcast map)
target = spark.createDataFrame(
    [(0, "the data the pipeline the index of the corpus")], ["doc_id", "text"]
)
snapshot = spark.createDataFrame(
    [(0, "the data pipeline"), (1, "zzz spam zzz spam zzz")],
    ["doc_id", "text"],
)
B = 512
dmap = dsir_map_table(fit_log_ratio(
    hashed_feature_counts(target, B), hashed_feature_counts(snapshot, B), B
))

feed_doc("d0.json", [
    (1, "the data of the pipeline is in the corpus"),   # target-like
    (2, "zzz spam zzz spam zzz spam zzz spam"),          # off-target
    (3, None),                                           # dropped by funnel
])
feed_doc("d1.json", [
    (4, "the data of the pipeline is in the corpus"),   # dup of 1
    (5, "the index of the corpus is the data"),          # target-like
])

stream = read_doc_stream(spark, dd)
gated = streaming_dsir_gate(
    streaming_funnel_gate(stream, min_tokens=3, lang="en"), dmap,
    min_log_weight=-10.0, buckets=B,
)
survivors = streaming_dedup_exact(gated).select("doc_id", "text")
qg = (
    survivors.writeStream.format("memory").queryName("clean_stream")
    .outputMode("append").start()
)
qg.processAllAvailable()
qg.stop()
spark.sql("select doc_id, text from clean_stream order by doc_id").show(truncate=50)

spark.stop()
