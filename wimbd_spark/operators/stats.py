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

    Implemented as rank()==1 over a global order — one shuffle, keeps
    every tied document like the reference does.
    """
    from pyspark.sql.window import Window

    ntok = F.size(tokenize(F.col(text_col))).alias("num_tokens")
    base = df.select(*id_cols, ntok)
    order = F.col("num_tokens").desc() if which == "max" else F.col("num_tokens").asc()
    w = Window.orderBy(order)
    return (
        base.withColumn("_r", F.rank().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
