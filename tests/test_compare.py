"""Corpus-comparison analytics (operators/compare.py) against
independent numpy/python references on the fixture corpus."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.compare import (
    js_divergence,
    log_odds_tokens,
    source_token_counts,
    token_freq_spectrum,
    vocab_cosine,
)


def _py_counts(documents, a, b):
    rows = (
        documents.filter(F.col("source").isin(a, b))
        .filter(F.col("text").isNotNull())
        .select("source", "text")
        .collect()
    )
    ca, cb = Counter(), Counter()
    for r in rows:
        toks = r["text"].split()
        (ca if r["source"] == a else cb).update(toks)
    return ca, cb


def test_source_token_counts_matches_python(documents):
    ca, cb = _py_counts(documents, "src0", "src1")
    got = {
        r["token"]: (r["count_a"], r["count_b"])
        for r in source_token_counts(documents, "src0", "src1").collect()
    }
    expect = {
        t: (ca.get(t, 0), cb.get(t, 0)) for t in set(ca) | set(cb)
    }
    assert got == expect


def test_log_odds_tokens_values(documents):
    ca, cb = _py_counts(documents, "src0", "src1")
    na, nb = sum(ca.values()), sum(cb.values())
    got = {
        r["token"]: (r["count_a"], r["count_b"], r["log_odds"])
        for r in log_odds_tokens(
            documents, "src0", "src1", min_total=10
        ).collect()
    }
    expect = {}
    for t in set(ca) | set(cb):
        x, y = ca.get(t, 0), cb.get(t, 0)
        if x + y >= 10:
            lo = math.log((x + 0.5) / (na - x + 0.5)) - math.log(
                (y + 0.5) / (nb - y + 0.5)
            )
            expect[t] = (x, y, round(lo, 6))
    assert set(got) == set(expect)
    for t in expect:
        assert got[t][:2] == expect[t][:2]
        assert got[t][2] == pytest.approx(expect[t][2], abs=1e-6)


def test_vocab_cosine_matches_numpy(documents):
    import numpy as np

    ca, cb = _py_counts(documents, "src0", "src1")
    vocab = sorted(set(ca) | set(cb))
    va = np.array([ca.get(t, 0) for t in vocab], dtype=np.float64)
    vb = np.array([cb.get(t, 0) for t in vocab], dtype=np.float64)
    expect = float(
        va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
    )
    got = vocab_cosine(documents, "src0", "src1").collect()[0]["cosine"]
    assert got == pytest.approx(expect, rel=1e-12)
    assert 0.0 < got < 1.0  # same-ish language but distinct sources


def test_js_divergence_matches_numpy(documents):
    ca, cb = _py_counts(documents, "src0", "src1")
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for t in set(ca) | set(cb):
        p, q = ca.get(t, 0) / na, cb.get(t, 0) / nb
        m = (p + q) / 2
        if p > 0:
            js += p * math.log2(p / m) / 2
        if q > 0:
            js += q * math.log2(q / m) / 2
    got = js_divergence(documents, "src0", "src1").collect()[0]["js"]
    assert got == pytest.approx(js, rel=1e-9)
    assert 0.0 <= got <= 1.0  # base-2 JS is bounded

    # identical distributions → 0
    same = js_divergence(documents, "src0", "src0").collect()[0]["js"]
    assert same == pytest.approx(0.0, abs=1e-12)


def test_token_freq_spectrum(documents):
    all_counts = Counter()
    for r in documents.filter(F.col("text").isNotNull()).select("text").collect():
        all_counts.update(r["text"].split())
    expect = Counter(all_counts.values())
    got = {
        r["occurrences"]: r["n_ngrams"]
        for r in token_freq_spectrum(documents, n=1).collect()
    }
    assert got == dict(expect)
    # spectrum identity: Σ n_ngrams = vocabulary size
    assert sum(got.values()) == len(all_counts)


def test_length_percentiles_matches_numpy(documents):
    import numpy as np

    from wimbd_spark.operators.stats import length_percentiles

    lens = np.array(
        [
            len(r["text"].split())
            for r in documents.filter(F.col("text").isNotNull())
            .select("text")
            .collect()
        ],
        dtype=np.float64,
    )
    got = {
        r["percentile"]: r["value"]
        for r in length_percentiles(documents).collect()
    }
    for p in (0.25, 0.5, 0.75, 0.9, 0.99):
        expect = float(np.quantile(lens, p))  # same linear interpolation
        assert got[p] == pytest.approx(expect, abs=1e-6)


def test_js_divergence_rejects_degenerate_base(documents):
    with pytest.raises(ValueError, match="base must be > 1"):
        js_divergence(documents, "src0", "src1", base=1.0)


def test_length_percentiles_empty_input_keeps_rows(spark):
    # empty / all-null text: one row per requested percentile with a
    # NULL value — never a silent 0-row result (ADVICE r4)
    from wimbd_spark.operators.stats import length_percentiles

    empty = spark.createDataFrame([], schema="doc_id long, text string")
    rows = length_percentiles(empty, percentiles=(0.5, 0.9)).collect()
    assert [(r["percentile"], r["value"]) for r in rows] == [
        (0.5, None),
        (0.9, None),
    ]
    allnull = spark.createDataFrame([(1, None)], "doc_id long, text string")
    rows = length_percentiles(allnull, percentiles=(0.5,)).collect()
    assert [(r["percentile"], r["value"]) for r in rows] == [(0.5, None)]


def test_gram_overlap_matches_python_sets(documents):
    from wimbd_spark.operators.compare import gram_overlap

    rows = documents.select("source", "text").collect()

    def gramset(src, n=2):
        out = set()
        for r in rows:
            if r["source"] == src and r["text"]:
                t = r["text"].split()
                out |= {
                    " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
                }
        return out

    a, b = gramset("src0"), gramset("src1")
    got = gram_overlap(documents, "src0", "src1", n=2).collect()[0]
    assert got["grams_a"] == len(a)
    assert got["grams_b"] == len(b)
    assert got["shared"] == len(a & b)
    assert got["jaccard"] == pytest.approx(len(a & b) / len(a | b))
    assert got["containment_a_in_b"] == pytest.approx(len(a & b) / len(a))
    assert got["containment_b_in_a"] == pytest.approx(len(a & b) / len(b))


def test_gram_overlap_disjoint_source(spark):
    from wimbd_spark.operators.compare import gram_overlap

    df = spark.createDataFrame(
        [("sA", "x y z"), ("sB", "p q r")], ["source", "text"]
    )
    got = gram_overlap(df, "sA", "sB", n=2).collect()[0]
    assert (got["grams_a"], got["grams_b"], got["shared"]) == (2, 2, 0)
    assert got["jaccard"] == 0.0


def test_vocab_stats_hand_computed(spark):
    from wimbd_spark.operators.compare import vocab_stats

    df = spark.createDataFrame(
        [("s0", "a a b"), ("s0", "b c"), ("s1", "x y"), ("s1", None)],
        ["source", "text"],
    )
    got = {r["source"]: r for r in vocab_stats(df).collect()}
    # s0: tokens [a,a,b,b,c] → total 5, distinct 3, singletons {c}
    assert got["s0"]["total_tokens"] == 5
    assert got["s0"]["distinct_tokens"] == 3
    assert got["s0"]["type_token_ratio"] == pytest.approx(3 / 5)
    assert got["s0"]["singleton_fraction"] == pytest.approx(1 / 3)
    # s1: [x,y] all singletons
    assert got["s1"]["singleton_fraction"] == pytest.approx(1.0)
    # corpus-wide form: one row, no group column
    allrow = vocab_stats(df, group_col=None).collect()[0]
    assert allrow["total_tokens"] == 7
    assert allrow["distinct_tokens"] == 5
