"""Degenerate-corpus sweep: every registry query on 0-doc and 1-doc data.

VERDICT r6 item 5: the ANSI DIVIDE_BY_ZERO zero-guard in
unique_ngrams_approx showed this bug class is live (the reference
tolerates absent text, src/cmd/util.rs:21-26). Every registry query
must (a) not crash and (b) still agree with its DuckDB oracle when the
corpus is empty or a single document — the two shapes where division
guards, empty-aggregation semantics (Spark returns one NULL-ish row
for ungrouped aggs on empty input, as SQL does), window frames over
one row, and join-with-nothing paths all get exercised.

The degenerate tables are carved from sf0.001 with pyarrow slices so
every schema quirk survives byte-for-byte (notably events.parquet's
TIMESTAMP(NANOS), which Spark only reads via the nanosAsLong flag) —
both engines read the identical files, exactly like the driver.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracles import TABLES, rowset  # noqa: E402

SRC_SF = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


def _carve(dst: str, n_rows: int | None) -> str:
    """Write each sf0.001 table to dst, truncated to n_rows (None=all)."""
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet")
        if n_rows is not None:
            tab = tab.slice(0, n_rows)
        pq.write_table(tab, f"{dst}/{t}.parquet")
    return dst


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory):
    return _carve(str(tmp_path_factory.mktemp("sf_empty")), 0)


@pytest.fixture(scope="session")
def onedoc_dir(tmp_path_factory):
    return _carve(str(tmp_path_factory.mktemp("sf_onedoc")), 1)


def _registry():
    import __spark_entry__ as entry

    return entry


def _names():
    return list(_registry().queries().keys())


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _sweep(spark, sf_dir, name):
    entry = _registry()
    fn = entry.queries()[name]
    sdf = fn(spark, sf_dir)  # must not raise
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    osql = entry.oracle_sql().get(name)
    if osql is None:  # pragma: no cover — registry is fully oracled
        return
    con = _duck(sf_dir)
    try:
        res = con.sql(osql)
        dcols = res.columns
        drows = res.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: columns spark={scols} duckdb={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duckdb={len(drows)}"
    )
    sset, dset = rowset(scols, srows), rowset(dcols, drows)
    assert sset == dset, (
        f"{name}: value mismatch\n  spark-only: "
        f"{[r for r in sset if r not in set(dset)][:3]}\n  duck-only : "
        f"{[r for r in dset if r not in set(sset)][:3]}"
    )


@pytest.mark.parametrize("name", _names())
def test_empty_corpus(spark, empty_dir, name):
    _sweep(spark, empty_dir, name)


@pytest.mark.parametrize("name", _names())
def test_one_doc_corpus(spark, onedoc_dir, name):
    _sweep(spark, onedoc_dir, name)


def test_bench_only_queries_run_on_degenerate(spark, empty_dir, onedoc_dir):
    """Bench-only cost-model variants must also tolerate degenerate
    input (no oracle — their correctness rides a registry twin)."""
    entry = _registry()
    for fn in entry.bench_only_queries().values():
        for d in (empty_dir, onedoc_dir):
            fn(spark, d).collect()
