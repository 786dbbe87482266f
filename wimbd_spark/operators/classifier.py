"""Naive-Bayes quality classifier — train + score + filter.

Method class (public): the "quality classifier" stage of LLM data
pipelines — GPT-3 filtered CommonCrawl with a linear classifier
trained on a high-quality positive corpus (Brown et al. 2020, appx A);
CCNet ranks by a fastText linear model (Wenzek et al. 2020). This is
the count-based multinomial-NB member of that family: interpretable
per-token log-likelihood-ratio weights, trainable and scorable as
pure Spark aggregations — and, because everything is integer counts
plus one rounded log per vocab token, bit-reproducible cross-engine
(the house oracle-hashable recipe, cf. operators/dsir.py which is the
HASHED-feature importance-weight sibling; this model keeps an explicit
capped vocabulary so the weights are inspectable).

    weight(t) = ln((c_pos(t)+1)/(N_pos+V)) - ln((c_neg(t)+1)/(N_neg+V))
    score(d)  = Σ_t m_t(d) · round6(weight(t))      (DECIMAL sum)

with V = |vocab| and N_class = Σ counts over the selected vocab
(add-1 smoothing over the vocab the model actually carries).

Spark-first, 100 TB posture:
- training is ONE token aggregation over pos ∪ neg (per-class
  conditional sums in the same groupBy), then a top-``max_vocab``
  TakeOrdered — the model is ≤ max_vocab rows, broadcast material by
  construction, exactly like the dsir/LM-gate model tables;
- scoring is explode_outer → broadcast model join → ONE groupBy(id)
  (the dsir scoring shape: featureless docs score 0.0, no corpus-wide
  join-back);
- per-token weights are rounded ONCE to 6 dp and cast DECIMAL(12,6),
  so per-document accumulation is order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wimbd_spark.functions.text import tokenize

DEFAULT_MIN_COUNT = 2
DEFAULT_MAX_VOCAB = 8192
_SCALE = 6


def _class_tokens(text_col: str) -> Column:
    """Lowercased unigram feature stream (the fastText default)."""
    return tokenize(F.lower(F.col(text_col)))


def fit_nb_classifier(
    pos: DataFrame,
    neg: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
    max_vocab: int = DEFAULT_MAX_VOCAB,
) -> DataFrame:
    """Train → model table (token, weight DECIMAL(12,6)), ≤ max_vocab
    rows. Vocabulary = tokens with combined count ≥ ``min_count``,
    top ``max_vocab`` by (combined count desc, token asc) —
    deterministic at any partitioning. Positive weight ⇒
    characteristic of ``pos``."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
    toks = lambda df, cls: df.select(  # noqa: E731
        F.explode(_class_tokens(text_col)).alias("token"),
        F.lit(cls).alias("_cls"),
    )
    counts = (
        toks(pos, 1)
        .unionByName(toks(neg, 0))
        .groupBy("token")
        .agg(
            F.sum(F.col("_cls")).alias("cp"),
            F.sum(F.lit(1) - F.col("_cls")).alias("cn"),
        )
    )
    vocab = (
        counts.filter((F.col("cp") + F.col("cn")) >= min_count)
        .orderBy((F.col("cp") + F.col("cn")).desc(), F.col("token").asc())
        .limit(max_vocab)
    )
    # persisted: totals AND the weight projection both read vocab —
    # without the cache each consumer re-runs the corpus token
    # aggregation (the double-subtree hazard fit_log_ratio
    # documents). The cached block is ≤ max_vocab narrow rows
    # (~100 KB at the default) — bounded, and released by the
    # scoped_persist FIFO (session.py) rather than lingering for the
    # session lifetime.
    from wimbd_spark.session import scoped_persist

    vocab = scoped_persist(vocab)
    # smoothing totals over the SELECTED vocab (one tiny agg over
    # ≤ max_vocab rows), broadcast back as a one-row crossJoin
    totals = vocab.agg(
        F.coalesce(F.sum("cp"), F.lit(0)).alias("np"),
        F.coalesce(F.sum("cn"), F.lit(0)).alias("nn"),
        F.count(F.lit(1)).alias("v"),
    )
    weight = F.log(
        (F.col("cp") + F.lit(1.0)) / (F.col("np") + F.col("v"))
    ) - F.log((F.col("cn") + F.lit(1.0)) / (F.col("nn") + F.col("v")))
    return vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(weight, _SCALE).cast("decimal(12,6)").alias("weight"),
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document classifier score → (id_col, score double).

    score = Σ_t m_t · weight(t) over the doc's token multiplicities;
    out-of-vocab tokens contribute nothing; featureless (NULL/empty)
    docs score 0.0. Exact DECIMAL accumulation. The model is broadcast
    (≤ max_vocab rows); ONE groupBy(id) shuffle covers every document
    (the dsir scoring shape)."""
    doc_toks = df.select(
        F.col(id_col),
        F.explode_outer(_class_tokens(text_col)).alias("token"),
    )
    return (
        doc_toks.join(F.broadcast(model), "token", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("weight"), F.lit(0).cast("decimal(12,6)"))
            .cast("double")
            .alias("score")
        )
    )


def nb_quality_filter(
    df: DataFrame,
    model: DataFrame,
    threshold: float = 0.0,
    *,
    mode: str = "drop",
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_col: str = "nb_keep",
) -> DataFrame:
    """Gate ``df`` on the classifier: keep rows scoring ≥ ``threshold``
    (``mode='drop'`` removes the rest; ``mode='flag'`` appends a
    boolean ``flag_col``). One scoring pass + a broadcast-friendly
    semi-join back on ``id_col`` (scores are (id, double) narrow
    rows)."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    scores = nb_score(df, model, text_col=text_col, id_col=id_col)
    keep = scores.filter(F.col("score") >= F.lit(float(threshold))).select(
        id_col
    )
    if mode == "drop":
        return df.join(keep, id_col, "left_semi")
    flagged = df.join(
        keep.withColumn(flag_col, F.lit(True)), id_col, "left"
    )
    return flagged.withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))


def nb_top_fraction(
    scores: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic top-fraction selection by classifier score (ties
    by id) — the same reproducible greedy selection dsir_top_fraction
    gives importance weights, so the two scorers are drop-in
    interchangeable in a selection pipeline. Persists ``scores`` for
    the count + TakeOrdered pair (and any caller reuse), exactly like
    the dsir twin (ADVICE r7)."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if not scores.is_cached:
        from wimbd_spark.session import scoped_persist

        scores = scoped_persist(scores)
    n = scores.count()
    k = max(1, int(n * fraction)) if n else 0
    return scores.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)
