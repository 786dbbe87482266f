"""Corpus summary statistics.

Parity: src/cmd/stats.rs:61-248 — total_tokens / total_documents /
total_bytes / min & max tokens-per-doc, plus arg-min/arg-max document
pointers (all documents achieving the extreme).

Spark-first: one aggregate pass for the scalars (partial+final agg
replaces the reference's atomic shared counters, src/cmd/stats.rs:93-104);
extreme-document pointers via a rank-1 window or a join against the
scalar extremes — no pointer-pruning state machine needed
(src/cmd/stats.rs:319-348 exists only because the reference streams).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wimbd_spark.functions.text import tokenize


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    bytes_col: str | None = None,
) -> DataFrame:
    """Single-row corpus stats.

    total_bytes counts UTF-8 bytes of the text payload (octet_length),
    or sums ``bytes_col`` when the corpus carries a precomputed size.
    """
    ntok = F.size(tokenize(F.col(text_col)))
    nbytes = (
        F.col(bytes_col)
        if bytes_col
        else F.coalesce(F.octet_length(F.col(text_col)), F.lit(0))
    )
    return df.select(
        ntok.alias("_ntok"), nbytes.cast("long").alias("_nbytes")
    ).agg(
        F.count(F.lit(1)).alias("total_documents"),
        F.sum("_ntok").alias("total_tokens"),
        F.sum("_nbytes").alias("total_bytes"),
        F.max("_ntok").alias("document_max_tokens"),
        F.min("_ntok").alias("document_min_tokens"),
    )


def extreme_token_docs(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    which: str = "max",
) -> DataFrame:
    """All documents achieving the min/max token count — the pointer
    lists of src/cmd/stats.rs:175-188 (`max_token_documents` /
    `min_token_documents`, schema {path,line,num_tokens} ≙ id cols +
    num_tokens).

    Scale-safe plan: compute the extreme with a scalar aggregate
    (partial+final agg, fully parallel), broadcast the 1-row result,
    and filter docs equal to it — keeps every tied document like the
    reference does, with NO unpartitioned window (which would shuffle
    the whole corpus into a single task).
    """
    ntok = F.size(tokenize(F.col(text_col))).alias("num_tokens")
    base = df.select(*id_cols, ntok)
    agg_fn = F.max if which == "max" else F.min
    extreme = base.agg(agg_fn("num_tokens").alias("_ext"))
    return base.join(
        F.broadcast(extreme), on=F.col("num_tokens") == F.col("_ext"), how="inner"
    ).drop("_ext")
