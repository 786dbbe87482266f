"""Corpus datasheet composition tests."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


def test_datasheet_sections_shapes(spark, docs):
    from wimbd_spark.operators.report import SECTIONS, corpus_datasheet

    sheets = corpus_datasheet(docs)
    assert set(sheets) == set(SECTIONS) | {"quality_rules"}
    ov = sheets["overview"].collect()[0]
    n = docs.count()
    assert ov["n_docs"] == n
    assert ov["total_tokens"] > 0 and ov["max_tokens"] >= ov["min_tokens"]
    # exact-dup count agrees with a direct distinct-hash computation
    dups = n - docs.select(
        F.md5(F.coalesce("text", F.lit(""))).alias("h")
    ).distinct().count()
    assert ov["n_exact_dup_docs"] == dups

    srcs = sheets["sources"].collect()
    assert sum(r["n_docs"] for r in srcs) == n
    langs = sheets["languages"].collect()
    assert sum(r["n_docs"] for r in langs) == n
    q = sheets["quality"].collect()[0]
    assert q["both_kept"] <= min(q["gopher_kept"], q["c4_kept"])
    # self-perplexity medians (r14 VERDICT item 6): both present,
    # finite, and the unigram one agrees with a direct lm_score median
    import math

    from wimbd_spark.operators.lm import lm_score, unigram_lm

    assert q["uni_ppl_median"] > 0 and math.isfinite(q["uni_ppl_median"])
    assert q["bi_ppl_median"] > 0 and math.isfinite(q["bi_ppl_median"])
    direct = (
        lm_score(docs, unigram_lm(docs), validate_lm=False)
        .agg(F.percentile("ppl", 0.5).alias("m"))
        .first()["m"]
    )
    assert q["uni_ppl_median"] == pytest.approx(direct, rel=1e-9)
    # the interpolated bigram concentrates mass on seen continuations:
    # on natural text its median ppl sits at or below the unigram's
    assert q["bi_ppl_median"] <= q["uni_ppl_median"]
    assert len(sheets["lengths"].collect()) == 5
    for r in sheets["pii"].collect():
        assert r["count"] >= 0


def test_datasheet_section_selection_and_validation(spark, docs):
    from wimbd_spark.operators.report import corpus_datasheet

    only = corpus_datasheet(docs, sections=("overview",))
    assert set(only) == {"overview"}
    with pytest.raises(ValueError, match="unknown datasheet sections"):
        corpus_datasheet(docs, sections=("overview", "nope"))
    # corpora without a source column skip that section, not crash
    nosrc = corpus_datasheet(
        docs.drop("source"), sections=("overview", "sources")
    )
    assert set(nosrc) == {"overview"}
