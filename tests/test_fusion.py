"""RRF fusion: formula, tie-breaks, hybrid composition."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.fusion import hybrid_search, rrf_fuse


def _r(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_matches_hand_computation(spark):
    a = _r(spark, [(1, 1), (2, 2), (3, 3)])
    b = _r(spark, [(3, 1), (1, 2), (4, 3)])
    got = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b], k=10).collect()}
    want = {
        1: round(round(1 / 61, 6) + round(1 / 62, 6), 6),
        2: round(1 / 62, 6),
        3: round(round(1 / 63, 6) + round(1 / 61, 6), 6),
        4: round(1 / 63, 6),
    }
    assert got == {k: pytest.approx(v, abs=1e-9) for k, v in want.items()}


def test_rrf_rank_and_ties(spark):
    # docs 1 and 2 get identical fused scores -> tie broken by id
    a = _r(spark, [(1, 1), (2, 2)])
    b = _r(spark, [(2, 1), (1, 2)])
    rows = rrf_fuse([a, b], k=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].rrf_score == rows[1].rrf_score


def test_rrf_k_and_validation(spark):
    a = _r(spark, [(i, i) for i in range(1, 8)])
    assert rrf_fuse([a], k=3).count() == 3
    with pytest.raises(ValueError):
        rrf_fuse([], k=3)
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError):
        rrf_fuse([a], k=3, c=-1)


def test_hybrid_search_composes(spark):
    docs = spark.createDataFrame(
        [
            (0, "anchor text about tables"),
            (1, "spark table scan"),
            (2, "table scan table scan"),
            (3, "unrelated words"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.95, 0.05]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = hybrid_search(docs, emb, "table scan", query_vec_id=0, k=4).collect()
    got = {r.doc_id: r for r in rows}
    # doc 1: dense rank 2 (cos .994) + sparse rank 2; doc 2: sparse 1,
    # dense 3; doc 3: dense 1 (cos .998) only — all present, fused
    assert set(got) == {1, 2, 3}
    assert [r.rank for r in rows] == [1, 2, 3]
    # two-list docs beat single-list docs here
    assert got[1].rrf_score > got[3].rrf_score


def test_hybrid_with_ivf_dense_leg(spark, tmp_path):
    """The documented scale swap: any (id, rank) list fuses — here the
    dense leg comes from the persisted IVF index instead of the exact
    cosine scan."""
    from wimbd_spark.operators.bm25 import bm25_topk
    from wimbd_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf_indexed,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_centroids=4)
    sparse = bm25_topk(docs, "table scan", k=10).select("doc_id", "rank")
    dense = cosine_topk_ivf_indexed(
        spark, idx, emb.filter(F.col("vec_id") == 0), k=10, n_probe=2
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("int"))
    fused = rrf_fuse([sparse, dense], k=5).collect()
    assert len(fused) == 5
    assert [r.rank for r in fused] == [1, 2, 3, 4, 5]
    assert fused[0].rrf_score >= fused[-1].rrf_score


def test_hybrid_filters_gate_both_legs(spark):
    """filters= restricts candidate generation in BOTH legs: the fused
    result only contains allowed docs, each leg's ranks re-number
    within the filtered candidates (full depth of eligible docs), and
    the query embedding may itself be outside the filter."""
    docs = spark.createDataFrame(
        [
            (0, "anchor text about tables", "b"),
            (1, "spark table scan", "a"),
            (2, "table scan table scan", "a"),
            (3, "unrelated words", "a"),
            (4, "table scan fast", "b"),
        ],
        "doc_id long, text string, source string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.95, 0.05]),
            (4, [0.8, 0.2]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = hybrid_search(
        docs, emb, "table scan", query_vec_id=0, k=5,
        filters=F.col("source") == "a",
    ).collect()
    ids = {r.doc_id for r in rows}
    assert ids == {1, 2, 3}  # doc 4 (src b) filtered; 0 is the anchor
    # equivalent to fusing the hand-filtered legs
    from wimbd_spark.operators.bm25 import bm25_topk
    from wimbd_spark.operators.similarity import cosine_topk

    sparse = bm25_topk(
        docs, "table scan", k=20, filters=F.col("source") == "a"
    ).select("doc_id", "rank")
    allowed = docs.filter(F.col("source") == "a").select(
        F.col("doc_id").alias("vec_id")
    )
    dense = cosine_topk(
        emb.join(allowed, "vec_id", "left_semi"),
        emb.filter(F.col("vec_id") == 0),
        k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    want = rrf_fuse([sparse, dense], k=5).collect()
    assert [(r.doc_id, r.rrf_score, r.rank) for r in rows] == [
        (r.doc_id, r.rrf_score, r.rank) for r in want
    ]
