"""Unigram LM scoring / perplexity-filter tests (CCNet-style gate)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.lm import lm_score, perplexity_filter, unigram_lm


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, "a b b"),
            (3, None),
        ],
        ["doc_id", "text"],
    )


def test_unigram_lm_mass_sums_to_one(corpus):
    rows = unigram_lm(corpus, alpha=0.5).collect()
    mass = sum(2.0 ** r["logp"] for r in rows)
    # V seen types + exactly one unseen pseudo-type
    assert mass == pytest.approx(1.0)
    unseen = [r for r in rows if r["token"] is None]
    assert len(unseen) == 1
    # N=7, V=2, denom = 7 + 0.5*3 = 8.5; p(a)=4.5/8.5, p(b)=3.5/8.5
    got = {r["token"]: 2.0 ** r["logp"] for r in rows}
    assert got["a"] == pytest.approx(4.5 / 8.5)
    assert got["b"] == pytest.approx(3.5 / 8.5)
    assert got[None] == pytest.approx(0.5 / 8.5)


def test_lm_score_hand_computed(spark, corpus):
    lm = unigram_lm(corpus, alpha=0.5)
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "zzz"), (12, None)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in lm_score(docs, lm).collect()}
    pa, pb, pu = 4.5 / 8.5, 3.5 / 8.5, 0.5 / 8.5
    want_10 = -(math.log2(pa) + math.log2(pb)) / 2
    assert got[10]["n_tokens"] == 2
    assert got[10]["bits_per_token"] == pytest.approx(want_10)
    assert got[10]["ppl"] == pytest.approx(2.0 ** want_10)
    # OOV token scores at the unseen fallback
    assert got[11]["bits_per_token"] == pytest.approx(-math.log2(pu))
    # NULL text: kept with zero tokens and NULL scores
    assert got[12]["n_tokens"] == 0
    assert got[12]["ppl"] is None


def test_perplexity_filter_drops_gibberish(spark):
    normal = [(i, "the cat sat on the mat again") for i in range(8)]
    docs = spark.createDataFrame(
        normal + [(99, "xq zv jk wp qm nb vc")], ["doc_id", "text"]
    )
    scored = lm_score(docs, unigram_lm(docs))
    ranks = {
        r["doc_id"]: r["ppl"]
        for r in scored.filter(F.col("ppl").isNotNull()).collect()
    }
    assert ranks[99] == max(ranks.values())  # gibberish scores worst
    cut = (ranks[0] + ranks[99]) / 2
    kept = perplexity_filter(docs, max_ppl=cut)
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(8))


def test_lm_score_matches_duckdb(spark, documents):
    """Train on the shared fixture corpus, score it, and cross-check
    every doc's bits/token against the same math in DuckDB."""
    lm = unigram_lm(documents, alpha=0.5)
    got = {
        r["doc_id"]: round(r["bits_per_token"], 9)
        for r in lm_score(documents, lm)
        .filter(F.col("bits_per_token").isNotNull())
        .collect()
    }
    con = duckdb.connect()
    con.register("docs", documents.toPandas())
    expect = dict(
        con.sql(
            """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    x -> x <> '')) AS token
          FROM docs WHERE text IS NOT NULL
        ), counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        tot AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
        scored AS (
          SELECT t.doc_id,
                 avg(-log2((c.c + 0.5) / (tot.n + 0.5 * (tot.v + 1)))) AS bpt
          FROM toks t JOIN counts c USING (token), tot
          GROUP BY t.doc_id
        )
        SELECT doc_id, round(bpt, 9) FROM scored
        """
        ).fetchall()
    )
    assert got == expect


def test_lm_score_validates_unseen_fallback_row(spark, corpus):
    """ADVICE r5 (medium): a caller-supplied LM without exactly one
    'token IS NULL' fallback row must raise — a missing row silently
    scored the whole corpus as empty; duplicates corrupted n_tokens."""
    no_null = spark.createDataFrame(
        [("a", -1.0), ("b", -2.0)], ["token", "logp"]
    )
    with pytest.raises(ValueError, match="exactly one"):
        lm_score(corpus, no_null)
    two_null = no_null.unionByName(
        spark.createDataFrame(
            [(None, -9.0), (None, -8.0)],
            schema=no_null.schema,
        )
    )
    with pytest.raises(ValueError, match="exactly one"):
        lm_score(corpus, two_null)
