"""Core operator tests (topk/botk/unique/stats/count/search) with
hand-computed goldens on tiny in-line corpora + DuckDB cross-checks on
the driver's documents table.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.count import (
    count_sequences,
    search_regex_counts,
    search_regex_locations,
)
from wimbd_spark.operators.keycount import key_count, normalize_distribution
from wimbd_spark.operators.stats import corpus_stats, extreme_token_docs
from wimbd_spark.operators.topk import (
    botk_ngrams,
    ngram_counts,
    topk_ngrams,
    unique_ngrams,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "a b a b c"),
        (2, "a b x"),
        (3, "z"),
        (4, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_counts_exact(spark, tiny):
    got = {
        r["ngram"]: r["count"] for r in ngram_counts(tiny, 2).collect()
    }
    assert got == {"a b": 3, "b a": 1, "b c": 1, "b x": 1}


def test_topk_rank_and_ties(spark, tiny):
    rows = topk_ngrams(tiny, 2, 3).orderBy("rank").collect()
    assert [(r["ngram"], r["count"], r["rank"]) for r in rows] == [
        ("a b", 3, 1),
        ("b a", 1, 2),  # ties broken by ngram asc → deterministic
        ("b c", 1, 3),
    ]


def test_botk(spark, tiny):
    rows = botk_ngrams(tiny, 1, 2).orderBy("rank").collect()
    assert [(r["ngram"], r["count"]) for r in rows] == [("c", 1), ("x", 1)]


def test_unique_exact_and_approx(spark, tiny):
    assert unique_ngrams(tiny, 1).collect()[0]["unique_count"] == 5
    approx = unique_ngrams(tiny, 1, approx=True).collect()[0]["unique_count"]
    assert abs(approx - 5) <= 1


def test_corpus_stats(spark, tiny):
    r = corpus_stats(tiny).collect()[0]
    assert r["total_documents"] == 4
    assert r["total_tokens"] == 5 + 3 + 1  # null text → 0 tokens
    assert r["document_max_tokens"] == 5
    assert r["document_min_tokens"] == 1
    assert r["total_bytes"] == len("a b a b c") + len("a b x") + len("z")


def test_extreme_docs_keeps_ties(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "e")], ["doc_id", "text"]
    )
    rows = extreme_token_docs(df, which="max").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]
    assert all(r["num_tokens"] == 2 for r in rows)


def test_count_sequences_overlapping(spark):
    # overlapping matches counted: "a a a" has two "a a" windows
    df = spark.createDataFrame([(1, "a a a b a a")], ["doc_id", "text"])
    got = {
        r["pattern"]: r["count"]
        for r in count_sequences(df, ["a a", "a a a", "zz"]).collect()
    }
    assert got == {"a a": 3, "a a a": 1, "zz": 0}


def test_search_regex_counts(spark, tiny):
    got = {
        r["pattern"]: r["count"]
        for r in search_regex_counts(tiny, ["a", "[xz]"]).collect()
    }
    assert got == {"a": 3, "[xz]": 2}


def test_search_regex_locations(spark):
    df = spark.createDataFrame([(1, "foo bar foo")], ["doc_id", "text"])
    rows = search_regex_locations(df, ["foo", "bar"]).collect()
    by_pat = {}
    for r in rows:
        by_pat.setdefault(r["pattern"], []).append(
            (r["match"], r["start_col"], r["end_col"])
        )
    assert by_pat["bar"] == [("bar", 5, 8)]
    # per-occurrence spans: identical matches get their own positions
    assert sorted(by_pat["foo"]) == [("foo", 1, 4), ("foo", 9, 12)]


def test_search_regex_locations_span_not_first_occurrence(spark):
    # the matched string also occurs at a NON-match site earlier in the
    # text — a locate()-chain would report 2; the true match is at 6.
    df = spark.createDataFrame([(1, "xfoo  foo bar")], ["doc_id", "text"])
    rows = search_regex_locations(df, [r"\bfoo\b"]).collect()
    assert [(r["match"], r["start_col"], r["end_col"]) for r in rows] == [
        ("foo", 7, 10)
    ]


def test_search_regex_locations_rejects_empty_matchable(spark):
    # zero-length matches break the split/extract_all span alignment —
    # rejected up front instead of silently corrupting every offset
    import pytest as _pytest

    df = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    for bad in ["a*", "(?=a)", ""]:
        with _pytest.raises(ValueError, match="empty"):
            search_regex_locations(df, [bad])
    # non-empty-matchable still fine
    assert search_regex_locations(df, ["a+"]).count() == 1


def test_key_count_against_duckdb(documents):
    got = {r["key"]: r["count"] for r in key_count(documents, "lang").collect()}
    expect = dict(
        duckdb.sql(
            "SELECT lang, count(*) FROM '/root/testdata/sf0.001/documents.parquet' GROUP BY lang"
        ).fetchall()
    )
    assert got == expect


def test_normalize_distribution(spark):
    df = spark.createDataFrame([("a", 3), ("b", 1)], ["key", "count"])
    got = {r["key"]: r["p"] for r in normalize_distribution(df).collect()}
    assert got == {"a": 0.75, "b": 0.25}


def test_topk_against_duckdb_on_documents(documents):
    got = [
        (r["ngram"], r["count"])
        for r in topk_ngrams(documents, 3, 20).orderBy("rank").collect()
    ]
    expect = duckdb.sql(
        """
        WITH toks AS (
          SELECT list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '') AS t
          FROM '/root/testdata/sf0.001/documents.parquet'
          WHERE text IS NOT NULL
        ), grams AS (
          SELECT array_to_string(list_slice(t, i, i+2), ' ') AS ngram
          FROM toks, unnest(generate_series(1, len(t)-2)) AS u(i)
          WHERE len(t) >= 3
        )
        SELECT ngram, count(*) AS count FROM grams
        GROUP BY ngram ORDER BY count DESC, ngram ASC LIMIT 20
        """
    ).fetchall()
    assert got == expect


def test_mixture_sample(spark):
    from wimbd_spark.operators.keycount import mixture_sample

    rows = [(i, f"doc {i}", "web" if i < 400 else "books") for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = mixture_sample(df, {"web": 0.5, "books": 2.25}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # web down-sampled to ~50% (hash gate: deterministic, approximate rate)
    n_web = len(by_src["web"])
    assert 120 <= n_web <= 280 and all(r["mix_epoch"] == 0 for r in by_src["web"])
    # books up-sampled: every doc at least 2 copies, ~25% get a third
    books = by_src["books"]
    per_doc = {}
    for r in books:
        per_doc.setdefault(r["doc_id"], set()).add(r["mix_epoch"])
    assert all(eps >= {0, 1} for eps in per_doc.values())
    assert len(per_doc) == 100  # no books doc dropped
    n3 = sum(1 for eps in per_doc.values() if len(eps) == 3)
    assert 5 <= n3 <= 50
    # unlisted sources dropped by default; kept at weight 1 on request
    df2 = df.withColumn(
        "source", F.when(F.col("doc_id") < 10, "other").otherwise(F.col("source"))
    )
    assert mixture_sample(df2, {"web": 1.0}).filter("source = 'other'").count() == 0
    kept = mixture_sample(df2, {"web": 1.0}, keep_unlisted=True)
    assert kept.filter("source = 'other'").count() == 10
    # determinism: identical output across runs
    a = sorted((r["doc_id"], r["mix_epoch"]) for r in out)
    b = sorted(
        (r["doc_id"], r["mix_epoch"])
        for r in mixture_sample(df, {"web": 0.5, "books": 2.25}).collect()
    )
    assert a == b


def test_stratified_sample_exact_k_per_group(spark):
    from wimbd_spark.operators.keycount import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)] + [(100, "tiny")],
        ["doc_id", "source"],
    )
    out = stratified_sample(df, k=4)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 4, "s1": 4, "s2": 4, "tiny": 1}
    # deterministic: same rows every run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, k=4).collect())
    assert a == b
    # a different salt draws a different sample (overwhelmingly)
    c = sorted(
        r["doc_id"]
        for r in stratified_sample(df, k=4, salt="v2").collect()
    )
    assert c != a
    assert out.columns == df.columns
    import pytest as _pt
    with _pt.raises(ValueError):
        stratified_sample(df, k=0)


def test_search_snippets_kwic(spark):
    from wimbd_spark.operators.count import search_snippets

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    got = {
        (r["start_col"]): r
        for r in search_snippets(docs, ["fox", "the"], window=6).collect()
    }
    # 'fox' at 17..20: snippet = 6 chars before + match + 6 after
    assert got[17]["snippet"] == "brown fox jumps"
    # 'the' at 1: left window clamps at string start
    assert got[1]["snippet"] == "the quick"
    # second 'the' at 32
    assert got[32]["snippet"] == " over the lazy "
    import pytest as _pt
    with _pt.raises(ValueError):
        search_snippets(docs, ["fox"], window=-1)


def test_ngram_count_spectrum(spark, tiny):
    from wimbd_spark.operators.topk import ngram_count_spectrum

    # tiny bigrams: "a b"x2, "b a", "b c", "b x", "a b" (doc2) ->
    # counts: "a b"=3, others 1 each
    got = {
        r.occurrences: r.n_ngrams
        for r in ngram_count_spectrum(tiny, 2).collect()
    }
    counts = {
        r.ngram: r["count"] for r in ngram_counts(tiny, 2).collect()
    }
    want: dict = {}
    for c in counts.values():
        want[c] = want.get(c, 0) + 1
    assert got == want
    assert sum(k * v for k, v in got.items()) == sum(counts.values())


def test_top_pmi_bigrams_hand_math(spark):
    import math

    from wimbd_spark.operators.topk import top_pmi_bigrams

    # "x y" always co-occurs (PMI high); "a b" co-occurs at chance-ish
    rows = [
        (1, "x y a c"),
        (2, "x y b d"),
        (3, "a d x y"),
        (4, "b c x y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = top_pmi_bigrams(df, k=3, min_count=2).collect()
    assert got[0].w1 == "x" and got[0].w2 == "y"
    assert got[0].pair_count == 4
    # hand PMI: p(xy) = 4/12 bigrams, p(x) = p(y) = 4/16 tokens
    want = round(math.log((4 / 12) / ((4 / 16) * (4 / 16))), 6)
    assert got[0].pmi == pytest.approx(want, abs=1e-9)
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # NPMI (Bouma 2009): pmi / -ln p(pair), in [-1, 1]
    want_npmi = round(
        math.log((4 / 12) / ((4 / 16) * (4 / 16)))
        / -math.log(4 / 12),
        6,
    )
    assert got[0].npmi == pytest.approx(want_npmi, abs=1e-9)
    # Bouma's [-1,1] bound assumes one probability space; the engine's
    # convention (unigram p over tokens, pair p over bigram slots —
    # same as the pmi column) can push very frequent pairs slightly
    # above 1, so only the lower bound is universal.
    assert all(r.npmi >= -1.0 for r in got)
    # rank_by="npmi" orders on the npmi column
    byn = top_pmi_bigrams(df, k=3, min_count=2, rank_by="npmi").collect()
    vals = [r.npmi for r in byn]
    assert vals == sorted(vals, reverse=True)
    assert [r.rank for r in byn] == list(range(1, len(byn) + 1))
    with pytest.raises(ValueError):
        top_pmi_bigrams(df, k=0)
    with pytest.raises(ValueError):
        top_pmi_bigrams(df, rank_by="mi")


def test_topk_ngrams_by_group(spark):
    from wimbd_spark.operators.topk import topk_ngrams_by

    rows = [
        (1, "a", "x y x y z"),
        (2, "a", "x y q"),
        (3, "b", "m n m n"),
        (4, "b", None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        (r.source, r.rank): (r.ngram, r["count"])
        for r in topk_ngrams_by(df, 2, 2, by="source").collect()
    }
    assert got[("a", 1)] == ("x y", 3)   # 2 in doc1 + 1 in doc2
    assert got[("a", 2)] == ("y q", 1)   # tie broken by ngram asc
    assert got[("b", 1)] == ("m n", 2)
    assert got[("b", 2)] == ("n m", 1)
    # pre-pruned result equals the naive unpruned window on all counts
    from pyspark.sql.window import Window as W

    from wimbd_spark.operators.topk import ngram_counts
    counts = (
        df.select("source", F.explode(
            __import__("wimbd_spark.functions.text", fromlist=["ngram_strings"])
            .ngram_strings(
                __import__("wimbd_spark.functions.text", fromlist=["tokenize"])
                .tokenize(F.col("text")), 2)
        ).alias("ngram"))
        .groupBy("source", "ngram").count()
    )
    w = W.partitionBy("source").orderBy(F.desc("count"), F.asc("ngram"))
    naive = {
        (r.source, r.rank): (r.ngram, r["count"])
        for r in counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2).collect()
    }
    assert got == naive
    with pytest.raises(ValueError):
        topk_ngrams_by(df, 2, 0)


def test_zipf_fit(spark):
    import math

    from wimbd_spark.operators.topk import zipf_fit

    # exact power law count = 1000 / rank -> slope -1, intercept ln(1000)
    rows = []
    did = 0
    for rank in range(1, 21):
        for _ in range(round(1000 / rank)):
            rows.append((did, f"w{rank:02d}"))
            did += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = zipf_fit(df, n=1, top=20).collect()[0]
    assert got.n_points == 20
    assert got.slope == pytest.approx(-1.0, abs=0.01)
    assert got.intercept == pytest.approx(math.log(1000), abs=0.05)
    with pytest.raises(ValueError):
        zipf_fit(df, top=1)
