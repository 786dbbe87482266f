"""BM25 ranked retrieval: scan path, postings path, sidecar plumbing."""

import math
import os

import pytest
from pyspark.sql import functions as F

from wimbd_spark.index import build_phrase_index, load_phrase_index
from wimbd_spark.operators.bm25 import (
    analyze_query,
    bm25_topk,
    bm25_topk_indexed,
    build_doclen_stats,
)

DOCS = [
    (1, "spark table scan fast"),
    (2, "spark spark spark join"),
    (3, "slow table merge"),
    (4, "fast fast query"),
    (5, "unrelated words only here"),
    (6, ""),  # zero tokens: excluded from N/avgdl (Lucene field stats)
    (7, None),  # null text: ignored entirely
]


def _py_bm25(docs, query, k1=1.2, b=0.75):
    """Independent pure-Python mirror with the engine's rounding."""
    terms = []
    for t in query.split():
        if t and t not in terms:
            terms.append(t)
    toks = {i: (t.split() if t else []) for i, t in docs if t is not None}
    dls = {i: len(ts) for i, ts in toks.items()}
    n = sum(1 for d in dls.values() if d > 0)
    sum_dl = sum(dls.values())
    avgdl = sum_dl / n
    scores = {}
    for term in terms:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf6 = round(math.log(1 + (n - df + 0.5) / (df + 0.5)), 6)
        for i, ts in toks.items():
            tf = ts.count(term)
            if tf:
                contrib = round(
                    idf6 * (tf / (tf + k1 * (1 - b + b * dls[i] / avgdl))), 6
                )
                scores[i] = round(scores.get(i, 0.0) + contrib, 6)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_analyze_query_dedup_and_order():
    assert analyze_query("b a  b c a") == ["b", "a", "c"]
    assert analyze_query("   ") == []


def test_scan_matches_python_mirror(docs_df):
    got = bm25_topk(docs_df, "spark fast table", k=10).collect()
    want = _py_bm25(DOCS, "spark fast table")
    assert [(r.doc_id, r.score) for r in got] == [
        (i, pytest.approx(s, abs=1e-9)) for i, s in want
    ]
    assert [r.rank for r in got] == list(range(1, len(want) + 1))


def test_scan_excludes_nonmatching_docs(docs_df):
    rows = bm25_topk(docs_df, "spark", k=10).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    # doc 2 has tf=3 of "spark" in dl=4: highest score
    assert rows[0].doc_id == 2


def test_k_limits_and_ties_break_by_id(spark):
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 6)], ["doc_id", "text"]
    )
    rows = bm25_topk(df, "same", k=3).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3]
    assert len({r.score for r in rows}) == 1


def test_zero_term_query_raises(docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, "   ")
    with pytest.raises(ValueError):
        bm25_topk(docs_df, "x", k=0)


def test_empty_corpus_returns_typed_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(empty, "anything", k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "rank"]


def test_indexed_matches_scan(docs_df, tmp_path):
    idx = str(tmp_path / "bm25idx")
    build_phrase_index(docs_df, idx, num_files=2)
    got_scan = bm25_topk(docs_df, "spark fast table", k=10).collect()
    got_idx = bm25_topk_indexed(
        docs_df.sparkSession, idx, "spark fast table", k=10
    ).collect()
    assert [(r.doc_id, r.score, r.rank) for r in got_idx] == [
        (r.doc_id, r.score, r.rank) for r in got_scan
    ]


def test_doclens_sidecar_hidden_from_postings_reader(docs_df, tmp_path):
    spark = docs_df.sparkSession
    idx = str(tmp_path / "idx2")
    build_phrase_index(docs_df, idx, num_files=2)
    before = load_phrase_index(spark, idx).count()
    out = build_doclen_stats(spark, idx)
    assert os.path.isdir(out)
    # postings reader must not pick up the underscore-prefixed sidecar
    assert load_phrase_index(spark, idx).count() == before
    lens = {
        r.doc_id: r.dl for r in spark.read.parquet(out).collect()
    }
    assert lens == {1: 4, 2: 4, 3: 3, 4: 3, 5: 4}


def test_indexed_builds_doclens_lazily(docs_df, tmp_path):
    spark = docs_df.sparkSession
    idx = str(tmp_path / "idx3")
    build_phrase_index(docs_df, idx, num_files=2)
    assert not os.path.exists(os.path.join(idx, "_doclens"))
    rows = bm25_topk_indexed(spark, idx, "spark", k=5).collect()
    assert os.path.exists(os.path.join(idx, "_doclens"))
    assert rows[0].doc_id == 2


def test_appended_docs_rejoin_ranked_results(docs_df, tmp_path):
    """r9 ADVICE regression: documents appended to the index after the
    `_doclens` sidecar was built used to be inner-joined away —
    silently absent from ranked results. The sidecar now records a
    data-file manifest and rebuilds itself when the index grows."""
    spark = docs_df.sparkSession
    idx = str(tmp_path / "sidx")
    build_phrase_index(docs_df, idx, num_files=2)
    # first ranked query builds the sidecar for the 7-doc corpus
    assert bm25_topk_indexed(spark, idx, "fast", k=10).count() > 0
    extra = spark.createDataFrame(
        [(99, "fast fast fast fast")], ["doc_id", "text"]
    )
    build_phrase_index(extra, idx, num_files=1, mode="append")
    got = bm25_topk_indexed(spark, idx, "fast", k=10).collect()
    assert 99 in {r.doc_id for r in got}
    # exact parity with the scan path over the combined corpus
    want = bm25_topk(docs_df.unionByName(extra), "fast", k=10).collect()
    assert [(r.doc_id, r.score, r.rank) for r in got] == [
        (r.doc_id, r.score, r.rank) for r in want
    ]


def test_fresh_sidecar_not_rebuilt(docs_df, tmp_path):
    """The staleness probe is metadata-only: an unchanged index must
    NOT trigger a sidecar rebuild on later queries."""
    spark = docs_df.sparkSession
    idx = str(tmp_path / "fidx")
    build_phrase_index(docs_df, idx, num_files=2)
    bm25_topk_indexed(spark, idx, "fast", k=5).collect()
    side = os.path.join(idx, "_doclens")
    before = {
        f: os.path.getmtime(os.path.join(side, f))
        for f in os.listdir(side)
    }
    bm25_topk_indexed(spark, idx, "table", k=5).collect()
    after = {
        f: os.path.getmtime(os.path.join(side, f))
        for f in os.listdir(side)
    }
    assert after == before


def test_duplicate_query_terms_score_once(docs_df):
    once = bm25_topk(docs_df, "spark fast", k=10).collect()
    twice = bm25_topk(docs_df, "spark fast spark", k=10).collect()
    assert [(r.doc_id, r.score) for r in once] == [
        (r.doc_id, r.score) for r in twice
    ]


def test_more_like_this_excludes_anchor(docs_df):
    from wimbd_spark.operators.bm25 import more_like_this

    rows = more_like_this(docs_df, 1, k=10, n_terms=3).collect()
    ids = [r.doc_id for r in rows]
    assert 1 not in ids and len(ids) >= 1
    assert [r.rank for r in rows] == list(range(1, len(ids) + 1))
    # doc 1 = "spark table scan fast": docs sharing those terms rank
    assert set(ids) <= {2, 3, 4}


def test_more_like_this_missing_anchor_zero_hits(docs_df):
    # ES semantics: MLT on a missing or empty document -> no hits
    from wimbd_spark.operators.bm25 import more_like_this

    for anchor in (999, 6):  # missing id / empty-text doc
        out = more_like_this(docs_df, anchor, k=5)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "score", "rank",
        ]


def test_compaction_rebuilds_doclens(docs_df, tmp_path):
    from wimbd_spark.index import compact_phrase_index

    spark = docs_df.sparkSession
    idx = str(tmp_path / "cidx")
    fresh = str(tmp_path / "cidx_fresh")
    build_phrase_index(docs_df, idx, num_files=2)
    build_doclen_stats(spark, idx)
    compact_phrase_index(spark, idx, fresh, num_files=1)
    assert os.path.isdir(os.path.join(fresh, "_doclens"))
    got = bm25_topk_indexed(spark, fresh, "spark fast table", k=10).collect()
    want = bm25_topk(docs_df, "spark fast table", k=10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]


def test_compaction_without_doclens_stays_sidecar_free(docs_df, tmp_path):
    from wimbd_spark.index import compact_phrase_index

    spark = docs_df.sparkSession
    idx = str(tmp_path / "nidx")
    fresh = str(tmp_path / "nidx_fresh")
    build_phrase_index(docs_df, idx, num_files=2)
    compact_phrase_index(spark, idx, fresh, num_files=1)
    assert not os.path.exists(os.path.join(fresh, "_doclens"))


def test_batch_matches_per_query_singles(docs_df):
    from wimbd_spark.operators.bm25 import bm25_topk_batch

    qs = ["spark fast table", "slow merge", "query"]
    batch = bm25_topk_batch(docs_df, qs, k=4).collect()
    for q in qs:
        single = [
            (r.doc_id, r.score, r.rank)
            for r in bm25_topk(docs_df, q, k=4).collect()
        ]
        got = [
            (r.doc_id, r.score, r.rank) for r in batch if r.query == q
        ]
        assert got == single, q


def test_batch_validation(docs_df):
    from wimbd_spark.operators.bm25 import bm25_topk_batch

    with pytest.raises(ValueError):
        bm25_topk_batch(docs_df, [], k=3)
    with pytest.raises(ValueError):
        bm25_topk_batch(docs_df, ["ok", "  "], k=3)
    with pytest.raises(ValueError):
        bm25_topk_batch(docs_df, ["ok"], k=0)


def test_batch_indexed_matches_singles_and_scan_batch(docs_df, tmp_path):
    from wimbd_spark.operators.bm25 import (
        bm25_topk_batch,
        bm25_topk_batch_indexed,
    )

    spark = docs_df.sparkSession
    idx = str(tmp_path / "batchidx")
    build_phrase_index(docs_df, idx, num_files=2)
    qs = ["spark fast table", "slow merge", "query"]
    got = bm25_topk_batch_indexed(spark, idx, qs, k=4).collect()
    want = bm25_topk_batch(docs_df, qs, k=4).collect()
    key = lambda r: (r.query, r.rank)  # noqa: E731
    assert [
        (r.query, r.doc_id, r.score, r.rank) for r in sorted(got, key=key)
    ] == [
        (r.query, r.doc_id, r.score, r.rank) for r in sorted(want, key=key)
    ]


# ------------------------------------------------ ES bool.filter parity

FILTERED_DOCS = [
    (1, "spark table scan fast", "a"),
    (2, "spark spark spark join", "b"),
    (3, "slow table merge", "a"),
    (4, "fast fast query", "b"),
    (5, "unrelated words only here", "a"),
    (6, "table table fast", "a"),
]


@pytest.fixture(scope="module")
def filtered_df(spark):
    return spark.createDataFrame(FILTERED_DOCS, ["doc_id", "text", "src"])


def test_filters_restrict_candidates_not_stats(filtered_df):
    """ES bool.filter: the filtered ranking is the UNfiltered ranking
    with non-matching docs removed — identical scores (index-wide
    stats), never a re-score over the subset."""
    unfiltered = bm25_topk(filtered_df, "spark fast table", k=10).collect()
    got = bm25_topk(
        filtered_df, "spark fast table", k=10, filters=F.col("src") == "a"
    ).collect()
    srcs = {i: s for i, _, s in FILTERED_DOCS}
    want = [r for r in unfiltered if srcs[r.doc_id] == "a"]
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
    # ranks re-number densely within the filtered result
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


def test_filters_null_predicate_drops_row(spark):
    df = spark.createDataFrame(
        [(1, "fast table", "a"), (2, "fast table", None)],
        ["doc_id", "text", "src"],
    )
    got = bm25_topk(df, "fast", k=10, filters=F.col("src") == "a").collect()
    assert [r.doc_id for r in got] == [1]


def test_indexed_candidates_match_scan_filters(filtered_df, tmp_path):
    """candidates= (terms-lookup form) is row-identical to the scan
    path's filters= — same scores, same ranks."""
    spark = filtered_df.sparkSession
    idx = str(tmp_path / "fidx")
    build_phrase_index(filtered_df, idx, num_files=2)
    cand = filtered_df.where(F.col("src") == "a").select("doc_id")
    got = bm25_topk_indexed(
        spark, idx, "spark fast table", k=10, candidates=cand
    ).collect()
    want = bm25_topk(
        filtered_df, "spark fast table", k=10, filters=F.col("src") == "a"
    ).collect()
    assert [(r.doc_id, r.score, r.rank) for r in got] == [
        (r.doc_id, r.score, r.rank) for r in want
    ]


def test_indexed_filters_pushed_into_postings_scan(filtered_df, tmp_path):
    """filters= (doc_id predicate form) reaches the postings parquet
    reader as a pushed filter — row-group pruning, not a post-join
    filter — and matches the scan path's rows."""
    from wimbd_spark.plans import explain_str

    spark = filtered_df.sparkSession
    idx = str(tmp_path / "fidx2")
    build_phrase_index(filtered_df, idx, num_files=2)
    q = bm25_topk_indexed(
        spark, idx, "spark fast table", k=10, filters=F.col("doc_id") <= 4
    )
    plan = explain_str(q)
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("doc_id" in p for p in pushed), plan
    want = bm25_topk(
        filtered_df, "spark fast table", k=10,
        filters=F.col("doc_id") <= 4,
    ).collect()
    assert [(r.doc_id, r.score, r.rank) for r in q.collect()] == [
        (r.doc_id, r.score, r.rank) for r in want
    ]


def test_more_like_this_indexed_matches_scan(docs_df, tmp_path):
    """Indexed MLT (term vector from postings, ranking from the
    indexed BM25 with exclude_id) is row-identical to the scan MLT."""
    from wimbd_spark.operators.bm25 import (
        more_like_this,
        more_like_this_indexed,
    )

    spark = docs_df.sparkSession
    idx = str(tmp_path / "mltidx")
    build_phrase_index(docs_df, idx, num_files=2)
    for anchor in (1, 2, 4):
        got = more_like_this_indexed(
            spark, idx, anchor, k=10, n_terms=3
        ).collect()
        want = more_like_this(docs_df, anchor, k=10, n_terms=3).collect()
        assert [(r.doc_id, r.score, r.rank) for r in got] == [
            (r.doc_id, r.score, r.rank) for r in want
        ], anchor


def test_more_like_this_indexed_missing_anchor(docs_df, tmp_path):
    from wimbd_spark.operators.bm25 import more_like_this_indexed

    spark = docs_df.sparkSession
    idx = str(tmp_path / "mltidx2")
    build_phrase_index(docs_df, idx, num_files=2)
    out = more_like_this_indexed(spark, idx, 999, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "score", "rank",
    ]


def test_indexed_exclude_id_matches_scan(docs_df, tmp_path):
    spark = docs_df.sparkSession
    idx = str(tmp_path / "exclidx")
    build_phrase_index(docs_df, idx, num_files=2)
    got = bm25_topk_indexed(
        spark, idx, "spark fast table", k=10, exclude_id=1
    ).collect()
    want = bm25_topk(
        docs_df, "spark fast table", k=10, exclude_id=1
    ).collect()
    assert 1 not in {r.doc_id for r in got}
    assert [(r.doc_id, r.score, r.rank) for r in got] == [
        (r.doc_id, r.score, r.rank) for r in want
    ]


def test_batch_filters_match_per_query_filters(filtered_df, tmp_path):
    """Batch filters= (scan and indexed/candidates) are row-identical
    to the per-query filtered singles."""
    from wimbd_spark.operators.bm25 import (
        bm25_topk_batch,
        bm25_topk_batch_indexed,
    )

    spark = filtered_df.sparkSession
    qs = ["spark fast table", "slow merge"]
    flt = F.col("src") == "a"
    got = bm25_topk_batch(filtered_df, qs, k=5, filters=flt).collect()
    want = []
    for q in qs:
        want += [
            (q, r.doc_id, r.score, r.rank)
            for r in bm25_topk(filtered_df, q, k=5, filters=flt).collect()
        ]
    key = lambda t: (t[0], t[3])  # noqa: E731
    assert sorted(
        [(r.query, r.doc_id, r.score, r.rank) for r in got], key=key
    ) == sorted(want, key=key)

    idx = str(tmp_path / "bfidx")
    build_phrase_index(filtered_df, idx, num_files=2)
    cand = filtered_df.where(flt).select("doc_id")
    got_idx = bm25_topk_batch_indexed(
        spark, idx, qs, k=5, candidates=cand
    ).collect()
    assert sorted(
        [(r.query, r.doc_id, r.score, r.rank) for r in got_idx], key=key
    ) == sorted(want, key=key)


def test_index_manifest_local_matches_hadoop_walk(spark, tmp_path):
    """r15 optimization: the os.walk fast path of
    _index_data_manifest must produce a byte-identical manifest to
    the Hadoop RemoteIterator walk (a mismatch would spuriously
    rebuild the _doclens sidecar on every query)."""
    import json

    from wimbd_spark.operators.bm25 import _index_data_manifest

    root = tmp_path / "idx"
    (root / "centroid=0").mkdir(parents=True)
    (root / "_hidden").mkdir()
    (root / "a.parquet").write_bytes(b"xx")
    (root / "centroid=0" / "part-0.parquet").write_bytes(b"yyy")
    (root / "_hidden" / "skip.parquet").write_bytes(b"z")
    (root / ".crc").write_bytes(b"z")

    local = _index_data_manifest(spark, str(root))

    # force the Hadoop walk by handing a file:// URI (the local fast
    # path strips file: but the scheme check uses "://")
    jvm_manifest = _index_data_manifest(spark, "file://" + str(root))
    assert local == jvm_manifest
    assert json.loads(local) == [
        ["a.parquet", 2],
        ["centroid=0/part-0.parquet", 3],
    ]
