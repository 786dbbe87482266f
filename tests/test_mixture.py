"""UniMax waterfilling allocation (operators/mixture.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wimbd_spark.operators.mixture import unimax_allocation


def _df(spark, sizes: dict[str, int]):
    rows = [
        Row(doc_id=i, source=s, text=" ".join(["w"] * k))
        for i, (s, k) in enumerate(sizes.items())
    ]
    return spark.createDataFrame(rows)


def _alloc(df):
    return {r["source"]: r["alloc"] for r in df.collect()}


def test_known_waterfilling_example(spark):
    # caps [1, 5, 10], budget 12 → level 6 → allocs [1, 5, 6]
    df = _df(spark, {"a": 1, "b": 5, "c": 10})
    out = unimax_allocation(df, budget_tokens=12, max_epochs=1.0)
    assert _alloc(out) == {"a": 1.0, "b": 5.0, "c": 6.0}
    weights = {r["source"]: r["weight"] for r in out.collect()}
    assert weights == {
        "a": round(1 / 12, 6),
        "b": round(5 / 12, 6),
        "c": round(6 / 12, 6),
    }


def test_budget_exceeding_caps_gives_caps(spark):
    df = _df(spark, {"a": 3, "b": 7})
    out = unimax_allocation(df, budget_tokens=100, max_epochs=2.0)
    assert _alloc(out) == {"a": 6.0, "b": 14.0}


def test_uniform_split_when_no_cap_binds(spark):
    df = _df(spark, {"a": 50, "b": 60, "c": 70})
    out = unimax_allocation(df, budget_tokens=30, max_epochs=1.0)
    assert _alloc(out) == {"a": 10.0, "b": 10.0, "c": 10.0}


def test_allocation_sums_to_min_budget_total_cap(spark, documents):
    out = unimax_allocation(documents, budget_tokens=5_000, max_epochs=1.5)
    rows = out.collect()
    total_alloc = sum(r["alloc"] for r in rows)
    total_cap = sum(r["cap"] for r in rows)
    assert total_alloc == pytest.approx(min(5_000, total_cap), abs=1e-3)
    for r in rows:
        assert r["alloc"] <= r["cap"] + 1e-9


def test_partition_layout_independent(spark, documents):
    a = sorted(tuple(r) for r in unimax_allocation(documents, 5_000).collect())
    b = sorted(
        tuple(r)
        for r in unimax_allocation(documents.repartition(11), 5_000).collect()
    )
    assert a == b


def test_empty_and_bad_args(spark):
    empty = spark.createDataFrame([], "doc_id long, source string, text string")
    assert unimax_allocation(empty, 100).count() == 0
    df = _df(spark, {"a": 1})
    with pytest.raises(ValueError):
        unimax_allocation(df, 0)
    with pytest.raises(ValueError):
        unimax_allocation(df, 10, max_epochs=0)
