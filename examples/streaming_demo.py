"""Structured Streaming demo: event files arriving as micro-batches →
watermarked tumbling counts + session windows, printed per trigger.

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
spark.stop()
