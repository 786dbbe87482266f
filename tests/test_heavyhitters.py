"""Two-pass heavy-hitter top-k (operators/heavyhitters.py).

Covers: exact-equivalence when capacity dominates distinct grams,
partition-layout independence, the Misra-Gries survival guarantee
under eviction pressure, bounded candidate sets, and degenerate
inputs."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wimbd_spark.operators.heavyhitters import ngram_summary, topk_ngrams_2pass
from wimbd_spark.operators.topk import topk_ngrams


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_matches_exact_topk_with_large_capacity(spark, documents):
    exact = topk_ngrams(documents, n=2, k=15)
    two_pass = topk_ngrams_2pass(documents, n=2, k=15, capacity=50_000)
    assert _rows(two_pass) == _rows(exact)


def test_partition_layout_independent_with_large_capacity(spark, documents):
    base = topk_ngrams_2pass(documents, n=1, k=10, capacity=50_000)
    reshuffled = topk_ngrams_2pass(
        documents.repartition(7), n=1, k=10, capacity=50_000
    )
    assert _rows(base) == _rows(reshuffled)


def test_heavy_hitter_survives_eviction(spark):
    # one gram holds 40% of a 1000-token single-partition stream while
    # 300 distinct fillers churn a capacity-8 table: MG guarantees any
    # gram with freq > N/capacity survives, and the exact recount then
    # restores its true count.
    heavy = ["hot"] * 400
    fillers = [f"w{i}" for i in range(300)] * 2
    text = " ".join(heavy + fillers)
    df = spark.createDataFrame([Row(text=text)]).repartition(1)
    top = topk_ngrams_2pass(df, n=1, k=1, capacity=8)
    assert _rows(top) == [("hot", 400, 1)]


def test_summary_lower_bounds_and_size(spark):
    words = ["a"] * 50 + ["b"] * 30 + [f"z{i}" for i in range(40)]
    df = spark.createDataFrame([Row(text=" ".join(words))]).repartition(1)
    summary = {r["ngram"]: r["lb"] for r in ngram_summary(df, 1, 16).collect()}
    assert len(summary) <= 16
    assert summary.get("a", 0) <= 50 and summary.get("b", 0) <= 30
    # undercount bound: N/capacity = 120/16 = 7.5
    assert summary["a"] >= 50 - 8 and summary["b"] >= 30 - 8


def test_candidate_set_bounded_and_broadcast(spark, documents):
    plan = topk_ngrams_2pass(
        documents, n=2, k=5, capacity=1_000, candidate_factor=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_and_null_text(spark):
    empty = spark.createDataFrame([], "text string")
    assert topk_ngrams_2pass(empty, n=2, k=5).count() == 0
    nulls = spark.createDataFrame([Row(text=None), Row(text="x y x")])
    assert _rows(topk_ngrams_2pass(nulls, n=1, k=1, capacity=100)) == [
        ("x", 2, 1)
    ]


def test_rejects_bad_parameters(spark, documents):
    with pytest.raises(ValueError):
        topk_ngrams_2pass(documents, n=1, k=0)
    with pytest.raises(ValueError):
        topk_ngrams_2pass(documents, n=1, k=50, capacity=10)


def test_chunked_compaction_single_oversized_batch():
    # r8 (ADVICE r7): one Arrow batch whose distinct-gram count dwarfs
    # capacity — compaction must run WITHIN the batch (chunks of
    # `capacity` items, peak table <= 2*capacity) and the classic MG
    # undercount bound (true - lb <= N_p / capacity) must survive the
    # more frequent compactions.
    from collections import Counter

    import pandas as pd

    from wimbd_spark.operators.heavyhitters import _misra_gries_partition

    cap = 100
    # 40 heavy grams (x400 each = well above N/cap = 210) buried in
    # 5000 singletons, all in ONE batch
    arrays = [[f"h{i % 40}"] for i in range(16000)] + [
        [f"rare{i}"] for i in range(5000)
    ]
    pdf = pd.DataFrame({"grams": arrays})
    out = list(_misra_gries_partition(iter([pdf]), cap))
    assert len(out) == 1
    summary = dict(zip(out[0]["ngram"], out[0]["lb"]))
    assert len(summary) <= cap
    true = Counter(g for arr in arrays for g in arr)
    n_items = sum(true.values())
    for g, lb in summary.items():
        assert 0 < lb <= true[g]
        assert true[g] - lb <= n_items / cap
    # every heavy hitter whose count clears the global undercount
    # bound must be present
    for g, c in true.items():
        if c > n_items / cap:
            assert g in summary, g


def test_grouped_matches_exact_grouped_with_large_capacity(spark, documents):
    """topk_ngrams_2pass_by == topk.topk_ngrams_by bit-for-bit when
    capacity >= per-(partition, group) distinct grams — the grouped
    twin of the global exactness condition."""
    from wimbd_spark.operators.heavyhitters import topk_ngrams_2pass_by
    from wimbd_spark.operators.topk import topk_ngrams_by

    exact = topk_ngrams_by(documents, 2, 5).select(
        "source", "ngram", "count", F.col("rank").cast("int").alias("rank")
    )
    two_pass = topk_ngrams_2pass_by(
        documents, n=2, k=5, capacity=50_000
    ).select(
        "source", "ngram", "count", F.col("rank").cast("int").alias("rank")
    )
    key = lambda r: (r[0], r[3])
    assert sorted(_rows(two_pass), key=key) == sorted(_rows(exact), key=key)


def test_grouped_partition_layout_independent(spark, documents):
    from wimbd_spark.operators.heavyhitters import topk_ngrams_2pass_by

    base = topk_ngrams_2pass_by(documents, n=1, k=4, capacity=50_000)
    reshuffled = topk_ngrams_2pass_by(
        documents.repartition(7), n=1, k=4, capacity=50_000
    )
    key = lambda r: (r[0], r[3])
    assert sorted(_rows(base), key=key) == sorted(_rows(reshuffled), key=key)


def test_grouped_heavy_hitter_survives_eviction_per_group(spark):
    """Each group keeps its own counter table: a 40%-mass gram in a
    tiny-capacity run survives eviction in BOTH groups even when the
    groups' token streams interleave within one partition."""
    from wimbd_spark.operators.heavyhitters import topk_ngrams_2pass_by

    rows = []
    for g in ("a", "b"):
        toks = [f"{g}hot" if i % 5 < 2 else f"{g}w{i}" for i in range(1000)]
        rows.append((g, " ".join(toks)))
    df = spark.createDataFrame(rows, ["source", "text"]).coalesce(1)
    out = topk_ngrams_2pass_by(df, n=1, k=1, capacity=16)
    got = {(r["source"], r["ngram"], r["count"]) for r in out.collect()}
    assert got == {("a", "ahot", 400), ("b", "bhot", 400)}


def test_grouped_rejects_bad_parameters(spark, documents):
    from wimbd_spark.operators.heavyhitters import topk_ngrams_2pass_by

    with pytest.raises(ValueError, match="k must be positive"):
        topk_ngrams_2pass_by(documents, n=1, k=0)
    with pytest.raises(ValueError, match="capacity"):
        topk_ngrams_2pass_by(documents, n=1, k=5, capacity=2)
