"""DSIR importance weighting (operators/dsir.py)."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wimbd_spark.operators.dsir import (
    dsir_log_weights,
    dsir_top_fraction,
    fit_log_ratio,
    hashed_feature_counts,
)

TARGET = [
    Row(doc_id=100, text="alpha beta gamma alpha beta"),
    Row(doc_id=101, text="alpha gamma beta alpha"),
]
POOL = [
    Row(doc_id=1, text="alpha beta alpha gamma"),      # target-like
    Row(doc_id=2, text="xray yankee zulu xray zulu"),  # not target-like
    Row(doc_id=3, text=None),                          # featureless
    Row(doc_id=4, text="   "),                         # featureless
]


def _py_weights(pool, target, buckets):
    """Independent plain-Python reimplementation of the weight math."""

    def feats(text):
        toks = [t for t in (text or "").lower().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    def counts(rows):
        c: dict[int, int] = {}
        for r in rows:
            for g in feats(r.text):
                c[bucket(g)] = c.get(bucket(g), 0) + 1
        return c

    ct, cr = counts(target), counts(pool)
    nt, nr = sum(ct.values()), sum(cr.values())
    ratio = {
        b: round(
            math.log((ct.get(b, 0) + 1.0) / (nt + buckets))
            - math.log((cr.get(b, 0) + 1.0) / (nr + buckets)),
            6,
        )
        for b in set(ct) | set(cr)
    }
    out = {}
    for r in pool:
        out[r.doc_id] = round(
            sum(ratio[bucket(g)] for g in feats(r.text)), 6
        )
    return out


def test_weights_match_independent_reimplementation(spark):
    pool = spark.createDataFrame(POOL)
    target = spark.createDataFrame(TARGET)
    got = {
        r["doc_id"]: round(r["log_weight"], 6)
        for r in dsir_log_weights(pool, target, buckets=64).collect()
    }
    assert got == _py_weights(POOL, TARGET, 64)


def test_target_like_scores_higher(spark):
    pool = spark.createDataFrame(POOL)
    target = spark.createDataFrame(TARGET)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(pool, target, buckets=256).collect()
    }
    assert w[1] > w[2]
    assert w[3] == 0.0 and w[4] == 0.0


def test_partition_layout_independent(spark, documents):
    target = documents.filter(F.col("source") == "src0")
    base = sorted(
        tuple(r) for r in dsir_log_weights(documents, target, 512).collect()
    )
    reshuffled = sorted(
        tuple(r)
        for r in dsir_log_weights(
            documents.repartition(13), target, 512
        ).collect()
    )
    assert base == reshuffled


def test_model_is_bucket_bounded_and_broadcast(spark, documents):
    target = documents.filter(F.col("source") == "src0")
    assert hashed_feature_counts(documents, 128).count() <= 128
    plan = (
        dsir_log_weights(documents, target, 128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    target = spark.createDataFrame(TARGET)
    assert dsir_log_weights(empty, target, 64).count() == 0
    # empty TARGET is legal: ratio degenerates to -ln p_raw shift
    pool = spark.createDataFrame(POOL)
    w = dsir_log_weights(pool, empty, 64)
    assert w.count() == len(POOL)
    ratio = fit_log_ratio(
        hashed_feature_counts(empty, 64), hashed_feature_counts(pool, 64), 64
    )
    assert ratio.filter(F.col("log_ratio").isNull()).count() == 0


def test_top_fraction_deterministic(spark):
    pool = spark.createDataFrame(POOL)
    target = spark.createDataFrame(TARGET)
    w = dsir_log_weights(pool, target, 64)
    top = dsir_top_fraction(w, 0.5)
    rows = [tuple(r) for r in top.collect()]
    assert len(rows) == 2
    assert rows == [tuple(r) for r in dsir_top_fraction(w, 0.5).collect()]
    with pytest.raises(ValueError):
        dsir_top_fraction(w, 0.0)


def test_rejects_bad_buckets(spark):
    pool = spark.createDataFrame(POOL)
    target = spark.createDataFrame(TARGET)
    with pytest.raises(ValueError):
        dsir_log_weights(pool, target, buckets=0)


def test_top_fraction_persists_weights(spark, documents):
    # ADVICE r7: count() + TakeOrdered must not re-run the weights DAG
    # (model fits + gram scans) — the input is cached by the call
    from wimbd_spark.operators.dsir import (
        dsir_log_weights,
        dsir_top_fraction,
    )

    target = documents.filter("source = 'src0'").select("text")
    w = dsir_log_weights(documents.limit(50), target)
    assert not w.is_cached
    kept = dsir_top_fraction(w, 0.2)
    assert w.is_cached
    n = w.count()
    got = kept.collect()
    assert len(got) == max(1, int(n * 0.2))
    # deterministic: repeated execution returns the same selection
    assert [r["doc_id"] for r in kept.collect()] == [
        r["doc_id"] for r in got
    ]
    w.unpersist()
