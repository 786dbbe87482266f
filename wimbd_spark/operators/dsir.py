"""DSIR-style importance weighting with hashed n-gram features.

Method source (public): Xie et al., "Data Selection for Language Models
via Importance Resampling" (NeurIPS 2023) — represent each document as
a bag of hashed unigram+bigram features, fit smoothed bag-of-words
models on a TARGET corpus and on the RAW pool, and score every raw
document with log p_target(x) - log p_raw(x). Documents with the
highest weights are the ones most "target-like"; resampling by these
weights selects pretraining data matching a high-quality target
distribution. The reference engine has no equivalent — this belongs to
the beyond-reference LLM-pipeline tier (SURVEY.md §2 extension).

Spark-first design, 100 TB posture:
- features are pure JVM expressions (tokenize → ngram_strings → md5
  hash → pmod): no Python in the hot path;
- both models are ``buckets``-row tables (default 8192) — broadcast
  material by construction, so scoring is a map-side broadcast join +
  one groupBy(doc_id) shuffle, never a model-side shuffle;
- the per-document weight is an EXACT DECIMAL sum: each bucket's
  log-ratio is rounded once to 6 dp and cast to DECIMAL, so the
  subsequent multiply-accumulate is order-independent — the same trick
  the engine's other float aggregates use to stay oracle-hashable
  (cross-engine double summation order differs; decimal sums don't).

Hashing uses the engine-canonical ``hash32`` (first 8 hex digits of
md5) so a DuckDB oracle reproduces buckets bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wimbd_spark.functions.text import hash32, ngram_strings, tokenize

DEFAULT_BUCKETS = 8192
_RATIO_SCALE = 6  # decimal places kept per bucket log-ratio


def _feature_grams(text_col: str):
    """Hashed-feature gram stream: lowercased unigrams + bigrams."""
    toks = tokenize(F.lower(F.col(text_col)))
    return F.concat(ngram_strings(toks, 1), ngram_strings(toks, 2))


def hashed_feature_counts(
    df: DataFrame, buckets: int = DEFAULT_BUCKETS, text_col: str = "text"
) -> DataFrame:
    """Bag-of-hashed-ngram counts for a corpus → (bucket, count)."""
    grams = df.select(F.explode(_feature_grams(text_col)).alias("g"))
    return (
        grams.select(F.pmod(hash32("g"), F.lit(buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def fit_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-bucket add-1-smoothed log importance ratio → (bucket,
    log_ratio DECIMAL): ln p_target(b) - ln p_raw(b) with
    p(b) = (c_b + 1) / (N + buckets). At most ``buckets`` rows —
    broadcastable regardless of corpus size."""
    t = target_counts.withColumnRenamed("count", "ct")
    r = raw_counts.withColumnRenamed("count", "cr")
    joined = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
    )
    # totals from each side's own aggregate, NOT from `joined`: summing
    # the joined table would hang a second consumer off the full-outer
    # join and Catalyst re-executes that whole subtree (scans included)
    # for it; per-side sums reuse each side's groupBy exchange instead
    totals = (
        t.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
        .crossJoin(r.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr")))
    )
    b = float(buckets)
    ratio = (
        F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(b)))
        - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.lit(b)))
    )
    # one-row scalar broadcast (house pattern — no global window)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(ratio, _RATIO_SCALE)
        .cast("decimal(12,6)")
        .alias("log_ratio"),
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight → (id_col, log_weight).

    weight(doc) = Σ_b m_b · [ln p_target(b) - ln p_raw(b)] over the
    doc's hashed feature multiplicities m_b. Raw model = ``df`` itself
    (the pool being scored), target model = ``target``. Featureless
    documents (NULL/empty text) score 0.0. Exact decimal accumulation —
    deterministic at any partitioning."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    from pyspark import StorageLevel

    from wimbd_spark.session import scoped_persist

    # explode_outer keeps featureless docs as a single null-gram row
    # (null bucket → no ratio match → sum skips it → coalesce 0), so
    # ONE groupBy(id) shuffle covers every document — no corpus-wide
    # join-back, and each gram occurrence contributes its bucket's
    # ratio once (the Σ m_b·ratio_b multiplicities, implicitly).
    # Persisted (disk-backed — gram-stream-sized): the stream is ALSO
    # the raw model's input, see below.
    doc_grams = scoped_persist(
        df.select(
            F.col(id_col),
            F.explode_outer(_feature_grams(text_col)).alias("g"),
        ).select(
            id_col, F.pmod(hash32("g"), F.lit(buckets)).alias("bucket")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    # The raw model counts the SAME gram stream the scoring pass
    # explodes (hashed_feature_counts(df) = the non-outer explode —
    # exactly doc_grams minus its null-bucket featureless-doc rows),
    # so it reads the cache instead of re-scanning, re-tokenizing and
    # re-hashing the whole pool: the r15 plan held FIVE corpus scans
    # (target counts, raw counts, both totals, scoring), the
    # persisted-counts form three, this one TWO (target + the shared
    # stream). Each counts table still feeds fit_log_ratio twice
    # (join side + its total) and stays ≤ ``buckets`` rows —
    # persisting them keeps the totals free.
    raw_counts = (
        doc_grams.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    ratio = fit_log_ratio(
        scoped_persist(hashed_feature_counts(target, buckets, text_col)),
        scoped_persist(raw_counts),
        buckets,
    )
    return (
        doc_grams.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(
                F.sum("log_ratio"), F.lit(0).cast("decimal(12,6)")
            )
            .cast("double")
            .alias("log_weight")
        )
    )


def dsir_top_fraction(
    weights: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic top-fraction selection by log weight (ties broken
    by id): the greedy variant of the paper's Gumbel resampling —
    reproducible, which matters more in a data pipeline than sampling
    noise. Uses exact count + TakeOrdered, no global window.

    The weights DataFrame is persisted here (ADVICE r7): count() and
    the TakeOrdered would otherwise each re-run the full weights DAG —
    model fits AND corpus gram scans — doubling (tripling, with the
    CLI's select join) the dominant cost. The cache is left in place
    because the returned plan is lazy and reads from it when the
    caller executes (and any further reuse, e.g. the --select
    semi-join, rides it too); call ``weights.unpersist()`` after the
    last job over the selection when memory matters — otherwise
    Spark's LRU block eviction reclaims it.
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if not weights.is_cached:
        from wimbd_spark.session import scoped_persist

        weights = scoped_persist(weights)
    n = weights.count()
    k = max(1, int(n * fraction)) if n else 0
    return weights.orderBy(
        F.col("log_weight").desc(), F.col(id_col).asc()
    ).limit(k)
