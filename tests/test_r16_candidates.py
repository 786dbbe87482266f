"""Keep the staged r16 registry candidates oracle-green before they
rotate into _REGISTRY (the r15 window is saturated — see the
_R16_CANDIDATES comment in __spark_entry__.py). Collected via the
round-agnostic entry.staged_candidates() accessor; an EMPTY staged
dict is fine (parametrize yields no cases)."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF = "/root/testdata/sf0.001"


def _check(spark, name, sf_dir):
    import __spark_entry__ as entry
    from check_oracles import TABLES, rowset

    fn, osql = entry.staged_candidates()[name]
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        res = con.sql(osql())
        dcols, drows = res.columns, res.fetchall()
    finally:
        con.close()
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows)
    assert rowset(scols, srows) == rowset(dcols, drows)


def _candidate_names():
    import __spark_entry__ as entry

    return sorted(entry.staged_candidates())


@pytest.mark.parametrize("name", _candidate_names())
def test_staged_candidates_match_duckdb(spark, name):
    _check(spark, name, SF)


@pytest.fixture(scope="module")
def degenerate_dirs(tmp_path_factory):
    """0-row and 1-row carves of every table (byte-identical schemas,
    like tests/test_degenerate.py) — staged rows must survive the
    degenerate sweep BEFORE promotion puts them in front of it
    (knn_join_pq_bulk_top3 hit this in r14: an empty index's empty
    pq_codebooks sidecar read as 'no sidecar' and raised)."""
    import pyarrow.parquet as pq

    from check_oracles import TABLES

    out = []
    for label, n in (("empty", 0), ("onedoc", 1)):
        d = str(tmp_path_factory.mktemp(f"stg_{label}"))
        for t in TABLES:
            tab = pq.read_table(f"{SF}/{t}.parquet")
            pq.write_table(tab.slice(0, n), f"{d}/{t}.parquet")
        out.append(d)
    return out


@pytest.mark.parametrize("name", _candidate_names())
def test_staged_candidates_survive_degenerate(spark, name, degenerate_dirs):
    for d in degenerate_dirs:
        _check(spark, name, d)


def test_c4_span_dedup_oracle_on_duplicate_heavy_docs(spark, tmp_path):
    """The sf tables carry no sentence punctuation (span dedup is a
    no-op there), so ALSO pin the oracle on a corpus with real
    duplicate spans."""
    import random

    import __spark_entry__ as entry
    from check_oracles import rowset

    rng = random.Random(77)
    pool = [f"Oracle pool sentence {i} carries meaning." for i in range(7)]
    rows = [
        (d, "src0", " ".join(rng.choice(pool) for _ in range(rng.randint(0, 6))))
        for d in range(60)
    ]
    sf_dir = str(tmp_path / "mini")
    os.makedirs(sf_dir)
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    # promoted into _REGISTRY in r13 — pin the registry pair itself
    fn, osql = entry._REGISTRY["c4_span_dedup_text"]
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet/*.parquet'"
        )
        res = con.sql(osql())
        dcols, drows = res.columns, res.fetchall()
    finally:
        con.close()
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(drows) == 60
    assert rowset(sdf.columns, srows) == rowset(dcols, drows)
    # and the corpus genuinely had duplicates to remove
    changed = sum(
        1 for (d, _, t0), (dd, t1) in zip(
            sorted(rows), sorted((r[0], r[1]) for r in srows)
        ) if t0 != t1
    )
    assert changed > 0


def test_candidates_disjoint_from_registry():
    import __spark_entry__ as entry

    clash = set(entry.staged_candidates()) & set(entry.queries())
    assert not clash, f"candidate names already registered: {clash}"
