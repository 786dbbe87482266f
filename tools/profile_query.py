#!/usr/bin/env python
"""Isolated per-query profiling: warm best-of-N with construction
(driver-side plan building + any collect jobs inside the query
function) and execution (noop sink) timed separately.

Usage: python tools/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), N_REPS (3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPS = int(os.environ.get("N_REPS", "3"))


def main() -> None:
    import __spark_entry__ as entrymod
    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if hasattr(entrymod, "bench_only_queries"):
        qs.update(entrymod.bench_only_queries())
    if hasattr(entrymod, "prepare_benchmark"):
        entrymod.prepare_benchmark(spark, SF_DIR)

    names = sys.argv[1:]
    # one warmup pass at the smallest SF, mirroring bench.py
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    for name in names:
        best = (float("inf"), 0.0, 0.0)
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if t2 - t0 < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
        print(
            f"{name}: total={best[0]:.3f}s construct={best[1]:.3f}s "
            f"exec={best[2]:.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
