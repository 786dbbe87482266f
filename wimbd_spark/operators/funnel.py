"""Cleaning-pipeline funnel report: stage-by-stage survivor counts.

A training-data pipeline is a chain of gates (CCNet / Gopher / Dolma
style: ingest → nonempty → length → language → dedup …) and the first
question asked of any run is "where did the documents go?". This
operator computes the whole funnel in TWO projected scans, not one
per stage: every gate is a JVM boolean column, the cumulative survivor
counts come from ONE conditional aggregation (scan 1, no shuffle), and
the dedup stage re-scans FILTERED to stage-3 survivors so its
md5-keyed shuffle carries only survivors (scan 2) — the same cost as
the standalone keep-first operator. A true single-scan variant exists
(window keyed on when(f3, md5(text)) with a per-row salt otherwise)
but it would shuffle the ENTIRE corpus; at 100 TB a second columnar
scan is cheaper than shuffling the non-survivors, so two scans is the
deliberate choice.

Individual gates reuse the engine's canonical semantics so the funnel
agrees with the standalone operators: tokenize (functions/text.py),
langid_heuristic (operators/textqc.py — shape of
wimbd/language/map_count.py:7-16), keep-first dedup key md5(text)
(operators/dedup.py:33, deduplicate_by_hash.py:48-62).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wimbd_spark.functions.text import tokenize
from wimbd_spark.operators.textqc import langid_heuristic

STAGE_NAMES = ("ingest", "nonempty", "token_length", "langid", "dedup_exact")


def stage_flags(
    text: Column,
    min_tokens: int,
    max_tokens: int,
    lang: str,
) -> tuple[Column, Column, Column]:
    """The funnel's cumulative gate flags (f1 nonempty, f2 length,
    f3 langid) as pure JVM boolean Columns — shared by the batch
    report and the streaming gate so the two can never drift. Never
    NULL: a NULL text short-circuits f1 to false."""
    toks = tokenize(text)
    f1 = text.isNotNull() & (F.trim(text) != F.lit(""))
    f2 = f1 & F.size(toks).between(min_tokens, max_tokens)
    f3 = f2 & (langid_heuristic(text, tokens=toks) == F.lit(lang))
    return f1, f2, f3


def quality_funnel(
    df: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 5000,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivors per cumulative cleaning stage → (stage, stage_name,
    survivors, dropped). Stages:

    0 ingest        every document
    1 nonempty      text non-NULL and non-blank
    2 token_length  whitespace token count in [min_tokens, max_tokens]
    3 langid        stopword-profile language == ``lang``
    4 dedup_exact   keep-first by md5(text) among stage-3 survivors

    Always returns exactly five rows (zeros on an empty corpus).
    """
    from pyspark import StorageLevel

    from wimbd_spark.session import scoped_persist

    c = F.col(text_col)
    f1, f2, f3 = stage_flags(c, min_tokens, max_tokens, lang)
    # Narrow flag projection, computed ONCE: the two consumers (the
    # conditional count aggregation and the survivor-only dedup
    # window) otherwise each re-run tokenize + the langid stopword
    # profile over the corpus. The dedup stage only needs the md5 KEY,
    # never the text, so the persisted rows are ~50 B regardless of
    # document size — at any scale caching this beats a second
    # tokenize+langid scan (the two-SCAN shape itself stays: shuffling
    # non-survivors would still be worse, see the module docstring).
    flagged = scoped_persist(
        df.select(
            F.col(id_col),
            F.md5(c).alias("_h"),
            f1.alias("_f1"),
            f2.alias("_f2"),
            f3.alias("_f3"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    counts = flagged.agg(
        F.count(F.lit(1)).alias("s0"),
        F.coalesce(F.sum(F.col("_f1").cast("long")), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.col("_f2").cast("long")), F.lit(0)).alias("s2"),
        F.coalesce(F.sum(F.col("_f3").cast("long")), F.lit(0)).alias("s3"),
    )
    # dedup stage: keep-first among stage-3 survivors (same key and
    # order as operators/dedup.py dedup_keep_first)
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    s4 = (
        flagged.filter(F.col("_f3"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .agg(F.count(F.lit(1)).alias("s4"))
    )
    return counts.crossJoin(F.broadcast(s4)).selectExpr(
        """stack(5,
             0, 'ingest',       s0, CAST(0 AS BIGINT),
             1, 'nonempty',     s1, s0 - s1,
             2, 'token_length', s2, s1 - s2,
             3, 'langid',       s3, s2 - s3,
             4, 'dedup_exact',  s4, s3 - s4
           ) AS (stage, stage_name, survivors, dropped)"""
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        F.col("survivors").cast("long").alias("survivors"),
        F.col("dropped").cast("long").alias("dropped"),
    )


def quality_funnel_by(
    df: DataFrame,
    group_col: str = "source",
    min_tokens: int = 5,
    max_tokens: int = 5000,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group funnel → (group_col, stage, stage_name, survivors,
    dropped): the same five stages as :func:`quality_funnel`, broken
    down by ``group_col`` (dedup runs WITHIN each group — identical to
    running the global funnel on each group's subset, pinned in
    tests). Same two-scan shape, with the aggregations keyed on the
    group: one conditional groupBy(group) plus a survivor-only window
    keyed (group, md5). Groups with no surviving duplicates still get
    all five rows; a group whose every doc fails stage 3 gets s4=0.
    """
    from pyspark import StorageLevel

    from wimbd_spark.session import scoped_persist

    c = F.col(text_col)
    f1, f2, f3 = stage_flags(c, min_tokens, max_tokens, lang)
    # same narrow persisted flag projection as quality_funnel: one
    # tokenize+langid pass feeds both aggregations, md5 key only
    flagged = scoped_persist(
        df.select(
            F.col(group_col),
            F.col(id_col),
            F.md5(c).alias("_h"),
            f1.alias("_f1"),
            f2.alias("_f2"),
            f3.alias("_f3"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    counts = flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("s0"),
        F.coalesce(F.sum(F.col("_f1").cast("long")), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.col("_f2").cast("long")), F.lit(0)).alias("s2"),
        F.coalesce(F.sum(F.col("_f3").cast("long")), F.lit(0)).alias("s3"),
    )
    w = Window.partitionBy(group_col, "_h").orderBy(
        F.col(id_col).asc()
    )
    s4 = (
        flagged.filter(F.col("_f3"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("s4"))
    )
    joined = counts.join(s4, group_col, "left").withColumn(
        "s4", F.coalesce(F.col("s4"), F.lit(0))
    )
    return joined.selectExpr(
        group_col,
        """stack(5,
             0, 'ingest',       s0, CAST(0 AS BIGINT),
             1, 'nonempty',     s1, s0 - s1,
             2, 'token_length', s2, s1 - s2,
             3, 'langid',       s3, s2 - s3,
             4, 'dedup_exact',  s4, s3 - s4
           ) AS (stage, stage_name, survivors, dropped)""",
    ).select(
        group_col,
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        F.col("survivors").cast("long").alias("survivors"),
        F.col("dropped").cast("long").alias("dropped"),
    )
