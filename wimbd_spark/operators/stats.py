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


def length_percentiles(
    df: DataFrame,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    text_col: str = "text",
    length: Column | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """(percentile, value) — exact linear-interpolation percentiles of
    the per-document length (token count by default; pass ``length``
    for chars/bytes/custom). Always emits len(percentiles) rows: an
    empty or all-null-text corpus yields NULL values, never 0 rows.

    Exact `percentile` (not approx_percentile) because the driver's
    oracle compares values bit-for-bit; both Spark and DuckDB
    (quantile_cont) use the p·(n−1) linear-interpolation definition
    over the same integer inputs, and ``round_to`` absorbs any last-ulp
    interpolation difference. At 100 TB prefer approx_percentile
    (t-digest sketch, one pass, no sort buffer); exact percentile
    collects each group's values into one aggregation buffer, which is
    fine for a scalar summary but the sketch is the scale default —
    the same exact/approx split as unique_ngrams vs its HLL twin.
    """
    ln = length if length is not None else F.size(tokenize(F.col(text_col)))
    ps = list(percentiles)
    vals = F.percentile(F.col("_len"), F.array(*[F.lit(p) for p in ps]))
    # empty/all-null input: percentile yields NULL and posexplode would
    # silently drop it — coalesce to a NULL-per-percentile array so the
    # output ALWAYS has len(percentiles) rows (callers iterate them)
    vals = F.coalesce(
        vals, F.array(*[F.lit(None).cast("double") for _ in ps])
    )
    row = df.filter(F.col(text_col).isNotNull()).select(
        ln.alias("_len")
    ).agg(vals.alias("_vals"))
    out = row.select(
        F.posexplode("_vals").alias("_i", "value")
    ).select(
        F.element_at(
            F.array(*[F.lit(p) for p in ps]), F.col("_i") + 1
        ).alias("percentile"),
        "value",
    )
    if round_to is not None:
        out = out.select(
            "percentile", F.round("value", round_to).alias("value")
        )
    return out


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
