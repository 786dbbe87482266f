"""scoped_persist (session.py): Dataset-level persists registered
FIFO and released once more than _SCOPED_PERSIST_CAP are live.
Dataset caches are NEVER reclaimed by the ContextCleaner (the
CacheManager holds each InMemoryRelation until an explicit
unpersist), so lazy-returning operators route through this registry
instead of leaking one cache entry per call for the session lifetime
(measured r15: ~+8 s across a 102-query bench run)."""

import pytest

from wimbd_spark import session as S


@pytest.fixture(autouse=True)
def _clean_registry():
    # isolate each test from registry state left by other suites
    while S._SCOPED_PERSISTS:
        try:
            S._SCOPED_PERSISTS.pop().unpersist()
        except Exception:
            pass
    yield
    while S._SCOPED_PERSISTS:
        try:
            S._SCOPED_PERSISTS.pop().unpersist()
        except Exception:
            pass


def _mk(spark, i):
    return spark.range(i, i + 10).selectExpr("id", "id * 2 as v")


def test_persist_registers_and_caches(spark):
    df = S.scoped_persist(_mk(spark, 0))
    assert df.is_cached
    assert S._SCOPED_PERSISTS[-1] is df
    assert df.count() == 10


def test_fifo_evicts_oldest_beyond_cap(spark):
    dfs = [S.scoped_persist(_mk(spark, i)) for i in range(S._SCOPED_PERSIST_CAP + 2)]
    # the two oldest are evicted, the newest cap survive
    assert not dfs[0].is_cached
    assert not dfs[1].is_cached
    for df in dfs[2:]:
        assert df.is_cached
    assert len(S._SCOPED_PERSISTS) == S._SCOPED_PERSIST_CAP


def test_evicted_plan_still_computes(spark):
    first = S.scoped_persist(_mk(spark, 100))
    expect = [(r["id"], r["v"]) for r in first.collect()]
    for i in range(S._SCOPED_PERSIST_CAP + 1):
        S.scoped_persist(_mk(spark, i))
    assert not first.is_cached
    # eviction only drops the cache — re-execution recomputes correctly
    assert [(r["id"], r["v"]) for r in first.collect()] == expect


def test_level_none_uses_default_persist(spark):
    df = S.scoped_persist(_mk(spark, 200))
    assert df.storageLevel.useMemory


def test_release_scoped_persists_empties_registry(spark):
    dfs = [S.scoped_persist(_mk(spark, i)) for i in range(3)]
    for df in dfs:
        df.count()
    n = S.release_scoped_persists()
    assert n == 3
    assert S._SCOPED_PERSISTS == []
    assert not any(df.is_cached for df in dfs)
    # released lazy plans still recompute correctly
    assert dfs[0].count() == 10


def test_registry_queries_release_previous_persists(spark):
    """Every declared query starts from a clean scoped-persist
    registry (the _query_scoped wrapper): stale cached tables from
    completed queries squeeze executor storage memory — measured r15:
    4 stale entries made unrelated queries 3-5x slower."""
    import __spark_entry__ as e

    leftover = S.scoped_persist(_mk(spark, 100))
    leftover.count()
    assert leftover.is_cached
    qs = e.queries()
    qs["source_counts"](spark, "/root/testdata/sf0.001").collect()
    assert not leftover.is_cached
