#!/usr/bin/env python
"""Fault-tolerant per-query measurement at sf1 (measurement regime only).

NOT the driver bench. bench.py stays the contract; this script exists
because the r15 VERDICT (#3) showed the sf0.1 suite is overhead-bound
(the 8-core run beats the 32-core run), so r16 targets must be ranked
by a scale where shuffles are visible. Differences from bench.py:

- data dir defaults to /tmp/sf1 (10x sf0.1, built by plans/make_sf1.py
  in the r16 session);
- each query is wrapped in try/except: at sf1 a few queries hit
  deliberate scale guards (decontaminate_ac_src0's 20k-phrase automaton
  budget) — recorded as errors, not fatal;
- results stream to a JSONL sidecar after every query so a killed run
  still yields a ranking;
- single timed pass after the sf0.001 warmup (ranking, not a headline).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF1_DIR", "/tmp/sf1")
OUT = os.environ.get("SF1_OUT", "/tmp/r16_sf1_perquery.jsonl")


def main() -> None:
    import __spark_entry__ as entrymod
    from wimbd_spark.session import get_spark
    from bench import HEADLINE

    spark = get_spark(app_name="wimbd-spark-sf1-rank")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if hasattr(entrymod, "bench_only_queries"):
        qs.update(entrymod.bench_only_queries())
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n.startswith("bench_") and n not in HEADLINE
    ]

    build_s = {}
    if hasattr(entrymod, "prepare_benchmark"):
        t0 = time.perf_counter()
        build_s = entrymod.prepare_benchmark(spark, SF_DIR)
        print(f"build: {time.perf_counter()-t0:.1f}s {build_s}", flush=True)

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    with open(OUT, "w") as f:
        for name in names:
            spark.sparkContext.setJobDescription(f"sf1:{name}")
            t0 = time.perf_counter()
            try:
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                rec = {"q": name, "s": round(time.perf_counter() - t0, 4)}
            except Exception as exc:
                rec = {
                    "q": name,
                    "s": round(time.perf_counter() - t0, 4),
                    "err": f"{type(exc).__name__}: {exc}"[:200],
                }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
