"""Cleaning-funnel report (operators/funnel.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from wimbd_spark.operators.dedup import dedup_keep_first
from wimbd_spark.operators.funnel import quality_funnel
from wimbd_spark.operators.textqc import langid_heuristic


DOCS = [
    Row(doc_id=1, text="the of and to in is it for on the"),  # en, 10 toks
    Row(doc_id=2, text="the of and to in is it for on the"),  # dup of 1
    Row(doc_id=3, text="el la de que en un es los el la"),    # es
    Row(doc_id=4, text="tiny"),                               # too short
    Row(doc_id=5, text=None),                                 # null
    Row(doc_id=6, text="   "),                                # blank
    Row(doc_id=7, text="the and of it is on for to the in"),  # en, distinct
]


def _funnel(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_funnel(df, **kw)
    return {r["stage_name"]: (r["survivors"], r["dropped"]) for r in out.collect()}


def test_stage_counts(spark):
    got = _funnel(spark, DOCS, min_tokens=5, max_tokens=100, lang="en")
    assert got == {
        "ingest": (7, 0),
        "nonempty": (5, 2),
        "token_length": (4, 1),   # doc 4 too short
        "langid": (3, 1),         # doc 3 is es
        "dedup_exact": (2, 1),    # docs 1/2 collapse
    }


def test_agrees_with_standalone_operators(spark, documents):
    out = {
        r["stage_name"]: r["survivors"]
        for r in quality_funnel(documents, min_tokens=1, max_tokens=10**6).collect()
    }
    nonempty = documents.filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    assert out["ingest"] == documents.count()
    assert out["nonempty"] == nonempty.count()
    en = nonempty.filter(langid_heuristic(F.col("text")) == "en")
    assert out["langid"] == en.count()
    assert out["dedup_exact"] == dedup_keep_first(en).count()


def test_empty_corpus_emits_five_zero_rows(spark):
    got = _funnel(spark, [])
    assert got == {name: (0, 0) for name in got}
    assert len(got) == 5


def test_monotone_nonincreasing(spark, documents):
    rows = quality_funnel(documents).orderBy("stage").collect()
    survivors = [r["survivors"] for r in rows]
    assert survivors == sorted(survivors, reverse=True)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["dropped"] == prev["survivors"] - cur["survivors"]


def test_funnel_by_group_matches_per_group_global_funnel(spark, documents):
    from wimbd_spark.operators.funnel import quality_funnel_by

    by = quality_funnel_by(documents, min_tokens=1, max_tokens=10**6)
    got = {
        (r["source"], r["stage_name"]): (r["survivors"], r["dropped"])
        for r in by.collect()
    }
    sources = [r["source"] for r in documents.select("source").distinct().collect()]
    assert len(got) == 5 * len(sources)
    for s in sources[:3]:  # spot-check three groups against the global funnel
        sub = documents.filter(F.col("source") == s)
        expect = {
            r["stage_name"]: (r["survivors"], r["dropped"])
            for r in quality_funnel(sub, min_tokens=1, max_tokens=10**6).collect()
        }
        for name, v in expect.items():
            assert got[(s, name)] == v, (s, name)


def test_funnel_by_group_all_filtered_group(spark):
    from pyspark.sql import Row

    from wimbd_spark.operators.funnel import quality_funnel_by

    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="the of and to in is it for on the"),
            Row(doc_id=2, source="b", text=None),  # whole group fails stage 1
        ]
    )
    got = {
        (r["source"], r["stage_name"]): r["survivors"]
        for r in quality_funnel_by(df, min_tokens=1, max_tokens=100).collect()
    }
    assert got[("b", "ingest")] == 1 and got[("b", "dedup_exact")] == 0
    assert got[("a", "dedup_exact")] == 1


def test_two_pass_threshold_matches_exact(spark, documents):
    from wimbd_spark.operators.heavyhitters import topk_ngrams_2pass
    from wimbd_spark.operators.topk import topk_ngrams

    exact = topk_ngrams(documents, n=1, k=10, threshold=5)
    two = topk_ngrams_2pass(
        documents, n=1, k=10, capacity=50_000, threshold=5
    )
    assert [tuple(r) for r in two.collect()] == [tuple(r) for r in exact.collect()]
