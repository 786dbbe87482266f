"""Interpolated bigram LM tests (CCNet-fidelity perplexity gate,
r13 VERDICT item 2): p = lam·pml(t|prev) + (1−lam)·p_uni(t), first
token pure unigram, pml from `bigram_lm`, p_uni from `unigram_lm`
(whose add-alpha NULL row keeps p > 0 everywhere)."""

import math

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.lm import (
    bigram_lm,
    bigram_perplexity_filter,
    bigram_score,
    lm_score,
    unigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "a b"),
            (3, "z z q"),  # every token AND bigram unseen by `train`
            (4, None),
            (5, "   "),
            (6, "a"),  # single token: first-token (unigram) branch only
        ],
        ["doc_id", "text"],
    )


@pytest.fixture(scope="module")
def train(corpus):
    return corpus.filter("doc_id <= 2")


def test_bigram_lm_is_conditional_ml(train):
    """pml = c(prev, token) / c(prev ·) and sums to 1 per context."""
    rows = {(r["prev"], r["token"]): r["pml"] for r in bigram_lm(train).collect()}
    # train = "a b a b c" + "a b": bigrams (a,b)x3, (b,a)x1, (b,c)x1
    assert rows == {
        ("a", "b"): pytest.approx(1.0),
        ("b", "a"): pytest.approx(0.5),
        ("b", "c"): pytest.approx(0.5),
    }
    by_ctx = {}
    for (p, _), v in rows.items():
        by_ctx[p] = by_ctx.get(p, 0.0) + v
    assert all(v == pytest.approx(1.0) for v in by_ctx.values())


def test_bigram_score_hand_math(spark, corpus, train):
    """Pin the per-doc bits against an independent Python evaluation
    of the interpolation (all three branches: seen bigram, unseen
    bigram with seen unigram, fully unseen token)."""
    out = {
        r["doc_id"]: r
        for r in bigram_score(
            corpus, unigram_lm(train, alpha=0.5), bigram_lm(train), lam=0.7
        ).collect()
    }
    # unigram over train: a:3 b:3 c:1, N=7 V=3, denom = 7 + 0.5*4 = 9
    pu = {"a": 3.5 / 9, "b": 3.5 / 9, "c": 1.5 / 9, None: 0.5 / 9}
    pml = {("a", "b"): 1.0, ("b", "a"): 0.5, ("b", "c"): 0.5}

    def p(prev, t):
        base = pu.get(t, pu[None])
        if prev is None:
            return base
        return 0.7 * pml.get((prev, t), 0.0) + (1.0 - 0.7) * base

    for doc_id, text in [(1, "a b a b c"), (3, "z z q"), (6, "a")]:
        seq = text.split()
        bits = [
            -math.log2(p(seq[i - 1] if i else None, seq[i]))
            for i in range(len(seq))
        ]
        expect = sum(bits) / len(bits)
        assert out[doc_id]["n_tokens"] == len(seq)
        assert out[doc_id]["bits_per_token"] == pytest.approx(expect)
        assert out[doc_id]["ppl"] == pytest.approx(2.0 ** expect)
    # zero-token docs: kept with n_tokens = 0 and NULL scores
    for doc_id in (4, 5):
        assert out[doc_id]["n_tokens"] == 0
        assert out[doc_id]["bits_per_token"] is None
        assert out[doc_id]["ppl"] is None


def test_lam_zero_reduces_to_unigram(corpus, train):
    """lam = 0 makes every position pure unigram — bigram_score must
    agree with lm_score exactly (the interpolation's sanity anchor)."""
    uni = unigram_lm(train, alpha=0.5)
    got = {
        r["doc_id"]: r["bits_per_token"]
        for r in bigram_score(corpus, uni, bigram_lm(train), lam=0.0).collect()
    }
    expect = {
        r["doc_id"]: r["bits_per_token"]
        for r in lm_score(corpus, uni, validate_lm=False).collect()
    }
    assert got.keys() == expect.keys()
    for k in got:
        if expect[k] is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(expect[k])


def test_bigram_score_validates_lam(corpus, train):
    uni, bi = unigram_lm(train), bigram_lm(train)
    for bad in (1.0, 1.5, -0.1):
        with pytest.raises(ValueError, match="lam"):
            bigram_score(corpus, uni, bi, lam=bad)


def test_bigram_filter_requires_both_model_halves(corpus, train):
    with pytest.raises(ValueError, match="BOTH"):
        bigram_perplexity_filter(corpus, 10.0, uni=unigram_lm(train))
    with pytest.raises(ValueError, match="BOTH"):
        bigram_perplexity_filter(corpus, 10.0, bi=bigram_lm(train))


def test_bigram_filter_drops_high_ppl_and_zero_token_docs(corpus, train):
    """Under the train model, docs 1/2/6 are in-distribution, doc 3 is
    gibberish (every token unseen), docs 4/5 have no tokens: a
    mid-range threshold keeps exactly {1, 2, 6}."""
    kept = sorted(
        r["doc_id"]
        for r in bigram_perplexity_filter(
            corpus,
            max_ppl=6.0,
            uni=unigram_lm(train, alpha=0.5),
            bi=bigram_lm(train),
            lam=0.7,
        ).collect()
    )
    assert kept == [1, 2, 6]


def test_bigram_filter_self_trained(corpus):
    """Self-training (uni=bi=None) scores the corpus under itself; a
    generous threshold keeps every doc that has tokens."""
    kept = sorted(
        r["doc_id"]
        for r in bigram_perplexity_filter(corpus, max_ppl=1e6).collect()
    )
    assert kept == [1, 2, 3, 6]


def test_bigram_score_broadcast_parity(corpus, train):
    """broadcast_lm=True is a pure physical hint: values identical."""
    uni, bi = unigram_lm(train, alpha=0.5), bigram_lm(train)
    a = {
        r["doc_id"]: r["bits_per_token"]
        for r in bigram_score(corpus, uni, bi, broadcast_lm=True).collect()
    }
    b = {
        r["doc_id"]: r["bits_per_token"]
        for r in bigram_score(corpus, uni, bi, broadcast_lm=False).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        if b[k] is None:
            assert a[k] is None
        else:
            assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_bigram_score_validates_unseen_fallback_row(spark, corpus, train):
    """ADVICE r14 (medium): a caller-supplied unigram table without
    exactly one 'token IS NULL' fallback row must raise — a missing
    row made the 1-row unseen cross-join empty and silently scored
    every doc as n_tokens=0/NULL, so bigram_perplexity_filter dropped
    the ENTIRE corpus with no error."""
    bi = bigram_lm(train)
    no_null = spark.createDataFrame(
        [("a", -1.0), ("b", -2.0)], ["token", "logp"]
    )
    with pytest.raises(ValueError, match="exactly one"):
        bigram_score(corpus, no_null, bi)
    two_null = no_null.unionByName(
        spark.createDataFrame(
            [(None, -9.0), (None, -8.0)], schema=no_null.schema
        )
    )
    with pytest.raises(ValueError, match="exactly one"):
        bigram_score(corpus, two_null, bi)
    # the filter wrapper validates caller-supplied models too
    with pytest.raises(ValueError, match="exactly one"):
        bigram_perplexity_filter(corpus, max_ppl=50.0, uni=no_null, bi=bi)


def test_bigram_score_validates_duplicate_bigram_keys(spark, corpus, train):
    """Duplicate (prev, token) rows in a caller-supplied bigram table
    multiply matching pair rows through the left join and corrupt
    n_tokens — must raise, including duplicate NULL-bearing keys."""
    uni = unigram_lm(train)
    dup = spark.createDataFrame(
        [("a", "b", 0.5), ("a", "b", 0.5)], ["prev", "token", "pml"]
    )
    with pytest.raises(ValueError, match="duplicate"):
        bigram_score(corpus, uni, dup)
    dup_null = spark.createDataFrame(
        [(None, "b", 0.5), (None, "b", 0.25)],
        "prev string, token string, pml double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        bigram_score(corpus, uni, dup_null)


def test_bigram_score_validate_accepts_good_model(spark, corpus, train, tmp_path):
    """A materialized model straight from unigram_lm/bigram_lm passes
    validation, and validate_lm=True changes no values vs False."""
    unigram_lm(train).write.parquet(str(tmp_path / "uni"))
    bigram_lm(train).write.parquet(str(tmp_path / "bi"))
    uni = spark.read.parquet(str(tmp_path / "uni"))
    bi = spark.read.parquet(str(tmp_path / "bi"))
    a = {
        r["doc_id"]: r["bits_per_token"]
        for r in bigram_score(corpus, uni, bi, validate_lm=True).collect()
    }
    b = {
        r["doc_id"]: r["bits_per_token"]
        for r in bigram_score(corpus, uni, bi, validate_lm=False).collect()
    }
    assert a == b
