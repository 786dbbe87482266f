#!/usr/bin/env python
"""Emulate the driver's correctness gate locally.

Runs every __spark_entry__.queries() entry on Spark AND its
oracle_sql() on DuckDB over the same parquet tables, then compares
row count, schema shape, and an order-insensitive value comparison.

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
Exits nonzero on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    import datetime
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mismatches must surface
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


def main():
    import __spark_entry__ as entrymod
    from wimbd_spark.session import get_spark

    spark = get_spark(
        app_name="check-oracles", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    # staged next-round candidates ride the same gate (also pinned by
    # tests/test_r14_candidates.py); names never collide with the
    # registry (test-enforced)
    for name, (fn, osql) in getattr(
        entrymod, "staged_candidates", dict
    )().items():
        qs[name] = fn
        oracles[name] = osql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            # since r6 every registry query carries an oracle
            # (unique_ngrams_approx's HLL bound rides inside its own
            # query as the approx_within_bound column); this branch
            # only fires if a future oracle-less query is added
            print(f"WEAK {name}: no oracle, rows={len(srows)}")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            continue
        sset, dset = rowset(scols, srows), rowset(dcols, drows)
        if sset != dset:
            failures.append(name)
            diff_s = [r for r in sset if r not in set(dset)][:3]
            diff_d = [r for r in dset if r not in set(sset)][:3]
            print(f"FAIL {name}: value mismatch ({len(srows)} rows)")
            print(f"  spark-only: {diff_s}")
            print(f"  duck-only : {diff_d}")
            continue
        print(f"OK   {name}: {len(srows)} rows")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
