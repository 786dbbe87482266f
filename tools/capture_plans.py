#!/usr/bin/env python
"""Capture .explain("formatted") for declared/bench queries into
plans/<tag>/<query>_<suffix>.txt (optimization-round evidence files).

Usage: python tools/capture_plans.py <outdir> <suffix> [query ...]
  e.g. python tools/capture_plans.py plans/r15 before simhash62_pairs
With no query names, captures every bench headline query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]

    import bench
    import __spark_entry__ as entrymod
    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if hasattr(entrymod, "bench_only_queries"):
        qs.update(entrymod.bench_only_queries())
    names = only or [n for n in bench.HEADLINE if n in qs] + [
        n for n in sorted(qs) if n.startswith("bench_") and n not in bench.HEADLINE
    ]
    if hasattr(entrymod, "prepare_benchmark"):
        entrymod.prepare_benchmark(spark, SF_DIR)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("captured", name)
    spark.stop()


if __name__ == "__main__":
    main()
