"""NB quality classifier: fit determinism, scoring, filter modes."""

import math

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.classifier import (
    fit_nb_classifier,
    nb_quality_filter,
    nb_score,
)

POS = [(1, "Good clean prose here"), (2, "clean good text"), (3, "good good prose")]
NEG = [(11, "spam spam junk"), (12, "junk clean spam"), (13, None)]


def _py_model(pos, neg, min_count=1, max_vocab=8192):
    from collections import Counter

    cp, cn = Counter(), Counter()
    for _, t in pos:
        if t:
            cp.update(t.lower().split())
    for _, t in neg:
        if t:
            cn.update(t.lower().split())
    vocab = [
        t
        for t in sorted(
            set(cp) | set(cn), key=lambda t: (-(cp[t] + cn[t]), t)
        )
        if cp[t] + cn[t] >= min_count
    ][:max_vocab]
    np_, nn, v = (
        sum(cp[t] for t in vocab),
        sum(cn[t] for t in vocab),
        len(vocab),
    )
    return {
        t: round(
            math.log((cp[t] + 1.0) / (np_ + v))
            - math.log((cn[t] + 1.0) / (nn + v)),
            6,
        )
        for t in vocab
    }


@pytest.fixture(scope="module")
def corpora(spark):
    pos = spark.createDataFrame(POS, ["doc_id", "text"])
    neg = spark.createDataFrame(NEG, ["doc_id", "text"])
    return pos, neg


def test_fit_matches_python_mirror(corpora):
    pos, neg = corpora
    model = {
        r.token: float(r.weight)
        for r in fit_nb_classifier(pos, neg, min_count=1).collect()
    }
    assert model == _py_model(POS, NEG)
    assert model["good"] > 0 > model["spam"]


def test_min_count_and_max_vocab(corpora):
    pos, neg = corpora
    m = fit_nb_classifier(pos, neg, min_count=2)
    toks = {r.token for r in m.collect()}
    # singletons (prose appears twice; here/text/junk... junk=2)
    assert "text" not in toks and "here" not in toks
    assert "good" in toks and "junk" in toks
    m2 = fit_nb_classifier(pos, neg, min_count=1, max_vocab=2)
    got = [r.token for r in m2.collect()]
    # top-2 by combined count desc, token asc: good(4), then clean(3)=spam(3)→clean
    assert sorted(got) == ["clean", "good"]


def test_score_matches_python_mirror(corpora):
    pos, neg = corpora
    model = fit_nb_classifier(pos, neg, min_count=1)
    pym = _py_model(POS, NEG)
    got = {
        r.doc_id: r.score
        for r in nb_score(pos.unionByName(neg), model).collect()
    }
    for i, t in POS + NEG:
        want = round(
            sum(pym.get(w, 0.0) for w in (t or "").lower().split()), 6
        )
        assert got[i] == pytest.approx(want, abs=1e-9), i
    # null-text doc present and scored 0
    assert got[13] == 0.0


def test_filter_modes(corpora):
    pos, neg = corpora
    both = pos.unionByName(neg)
    model = fit_nb_classifier(pos, neg, min_count=1)
    kept = nb_quality_filter(both, model, threshold=0.0)
    ids = {r.doc_id for r in kept.collect()}
    assert {1, 2, 3} <= ids and 11 not in ids and 12 not in ids
    flagged = nb_quality_filter(both, model, threshold=0.0, mode="flag")
    fl = {r.doc_id: r.nb_keep for r in flagged.collect()}
    assert fl[1] is True and fl[11] is False
    assert flagged.count() == both.count()


def test_validation(corpora):
    pos, neg = corpora
    with pytest.raises(ValueError):
        fit_nb_classifier(pos, neg, min_count=0)
    with pytest.raises(ValueError):
        fit_nb_classifier(pos, neg, max_vocab=0)
    with pytest.raises(ValueError):
        nb_quality_filter(pos, fit_nb_classifier(pos, neg), mode="bogus")


def test_empty_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    m = fit_nb_classifier(empty, empty)
    assert m.count() == 0
    scored = nb_score(empty, m)
    assert scored.count() == 0
    assert [f.name for f in scored.schema.fields] == ["doc_id", "score"]


def test_nb_top_fraction(corpora):
    from wimbd_spark.operators.classifier import nb_top_fraction

    pos, neg = corpora
    both = pos.unionByName(neg)
    scores = nb_score(both, fit_nb_classifier(pos, neg, min_count=1))
    top = nb_top_fraction(scores, 0.5).collect()
    assert len(top) == 3  # 6 docs -> top 3
    assert {r.doc_id for r in top} == {1, 2, 3}  # the positives win
    with pytest.raises(ValueError):
        nb_top_fraction(scores, 0.0)
    # empty input selects nothing
    empty = scores.filter("doc_id > 1000")
    assert nb_top_fraction(empty, 0.5).count() == 0
