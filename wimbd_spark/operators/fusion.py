"""Reciprocal Rank Fusion — hybrid sparse + dense retrieval.

Method source (public): Cormack, Clarke, Büttcher, "Reciprocal Rank
Fusion outperforms Condorcet and individual rank learning methods"
(SIGIR 2009): fuse N ranked lists by

    rrf(d) = Σ_lists 1 / (c + rank_list(d))        (c = 60 canonical)

RRF is the standard way modern search stacks combine a BM25 (sparse)
list with an embedding-ANN (dense) list — it needs only ranks, so
incomparable score scales fuse cleanly. The engine already produces
both sides (operators/bm25.py, operators/similarity.py); this closes
the hybrid-retrieval loop. No reference equivalent (beyond-reference
search tier).

Determinism (house recipe): each list's contribution 1/(c + rank) is
rounded once to 6 dp and cast DECIMAL(12,6), so the per-document sum
is order-independent and SQL-oracle-hashable; final ties break by id.

Scale: inputs are top-k ranked lists (k rows each, already tiny);
fusion is a union + ONE groupBy(id) over ≤ Σ k_i rows + a top-k.
Nothing here touches a corpus — cost is independent of corpus size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_RRF_C = 60
_SCALE = 6


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    *,
    c: int = DEFAULT_RRF_C,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists → (id_col, rrf_score double, rank int), top-k
    by fused score (ties by ascending id). Each input needs (id_col,
    rank_col); a document absent from a list contributes nothing for
    it (the standard RRF convention)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if c < 0:
        raise ValueError(f"c must be >= 0, got {c}")
    contribs = [
        r.select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(c) + F.col(rank_col)), _SCALE)
            .cast("decimal(12,6)")
            .alias("_contrib"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    scored = u.groupBy(id_col).agg(
        F.sum("_contrib").cast("double").alias("rrf_score")
    )
    top = scored.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec_id: int,
    k: int = 10,
    *,
    depth: int = 20,
    c: int = DEFAULT_RRF_C,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    filters=None,
) -> DataFrame:
    """BM25 + exact-cosine hybrid: fuse the sparse top-``depth`` for
    ``query`` with the dense top-``depth`` neighbors of the embedding
    at ``query_vec_id`` (ids shared between ``docs`` and
    ``embeddings``). Returns (id_col, rrf_score, rank), top-k fused.
    Swap the dense side for the IVF/PQ paths at scale — any
    (id, rank) list fuses.

    ``filters`` (boolean Column over ``docs`` columns) applies the ES
    bool.filter convention to BOTH legs' CANDIDATE GENERATION: the
    sparse leg gates candidacy inside its scan (``bm25_topk
    filters=``, stats index-wide); the dense leg's corpus side is
    semi-joined to the allowed ids before ranking, so each leg's
    top-``depth`` is a full depth of eligible documents (filtering
    AFTER ranking would silently thin the lists the fusion sees). The
    query embedding is looked up in the UNfiltered embeddings — an
    anchor outside the filter is still a valid query, matching MLT's
    anchor convention."""
    from wimbd_spark.operators.bm25 import bm25_topk
    from wimbd_spark.operators.similarity import cosine_topk

    sparse = bm25_topk(
        docs, query, k=depth, id_col=id_col, text_col=text_col,
        filters=filters,
    ).select(id_col, "rank")
    queries = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    corpus = embeddings
    if filters is not None:
        allowed = docs.filter(filters).select(
            F.col(id_col).alias(vec_id_col)
        )
        corpus = embeddings.join(allowed, vec_id_col, "left_semi")
    dense = cosine_topk(
        corpus, queries, k=depth, id_col=vec_id_col, vec_col=vec_col
    ).select(F.col("neighbor_id").alias(id_col), "rank")
    return rrf_fuse(
        [sparse, dense], k=k, c=c, id_col=id_col, rank_col="rank"
    )
