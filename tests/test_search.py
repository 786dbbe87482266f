"""ES-parity search API tests, incl. the slop examples documented in
wimbd/es/__init__.py:150-153.
"""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.search import (
    build_phrase_predicate,
    count_documents_containing_phrases,
    count_documents_for_each_phrase,
    count_total_occurrences_of_unigrams,
    get_documents_containing_phrases,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "I like apples", "en"),
        (2, "I really like apples", "en"),
        (3, "like I said", "en"),
        (4, "apples like I", "fr"),
        (5, "I like", "en"),
        (6, None, "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "subset"])


def _match_ids(corpus, **kw):
    df = get_documents_containing_phrases(corpus, num_documents=None, **kw)
    return sorted(r["doc_id"] for r in df.collect())


def test_phrase_exact_token_aligned(corpus):
    assert _match_ids(corpus, phrases=["I like"]) == [1, 5]


def test_phrase_slop(corpus):
    # "I like" slop=1 also matches "I really like" (documented intent,
    # wimbd/es/__init__.py:150-153) — but not "like I".
    assert _match_ids(corpus, phrases=["I like"], slop=1) == [1, 2, 5]


def test_phrase_or_and(corpus):
    assert _match_ids(corpus, phrases=["apples", "said"]) == [1, 2, 3, 4]
    assert _match_ids(
        corpus, phrases=["apples", "really"], all_phrases=True
    ) == [2]


def test_phrase_regexp(corpus):
    assert _match_ids(corpus, phrases=[r"^i\s+like"], is_regexp=True) == [1, 5]


def test_subset_filter(corpus):
    n = count_documents_containing_phrases(
        corpus, ["like"], filters={"subset": "en"}
    )
    assert n == 4


def test_count_for_each_phrase(corpus):
    got = {
        r["phrase"]: r["count"]
        for r in count_documents_for_each_phrase(
            corpus, ["apples", ["I", "really"], "zzz"]
        ).collect()
    }
    assert got == {"apples": 3, "I AND really": 1, "zzz": 0}


def test_unigram_ttf(corpus):
    got = {
        r["unigram"]: r["count"]
        for r in count_total_occurrences_of_unigrams(
            corpus, ["I", "like", "zzz"]
        ).collect()
    }
    assert got == {"I": 5, "like": 5, "zzz": 0}


def test_retrieval_sorted_limited(corpus):
    rows = get_documents_containing_phrases(
        corpus, ["like"], num_documents=2, sort_field="doc_id"
    ).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]


def test_substring_mode(corpus):
    # token_aligned=False: raw contains — "I like" matches "apples like I"? no,
    # but substring "like I" does match doc 3 and 4.
    ids = _match_ids(corpus, phrases=["like I"], token_aligned=False)
    assert ids == [3, 4]
