"""Driver-contract integrity tests for __spark_entry__."""

import pytest

import __spark_entry__ as entry


def test_registry_shapes():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # every query is oracle-gated since r6 (unique_ngrams_approx got
    # its error-bound oracle — r5 VERDICT item 3)
    assert len(set(qs) - set(oracles)) == 0
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.simpleString() == (
        "struct<ngram:string,count:bigint,rank:bigint>"
    )


def test_unique_ngrams_approx_error_bound(spark):
    """The HLL estimate must land within k·rsd of the exact distinct
    count — the bound the driver oracle now asserts (the exact_count
    column is the bit-for-bit DuckDB side)."""
    row = entry.q_unique_ngrams_approx(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.exact_count > 0
    assert row.approx_within_bound is True


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_all_queries_execute_and_have_stable_schemas(spark, sf_dir):
    """Every registered query runs at the smoke SF and returns rows
    with a non-empty schema (the full value check is the DuckDB gate —
    tools/check_oracles.py)."""
    failures = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            assert df.schema.fields
            df.limit(1).collect()
        except Exception as exc:  # pragma: no cover
            failures.append((name, str(exc).splitlines()[0][:100]))
    assert not failures, failures
