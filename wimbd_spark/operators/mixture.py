"""UniMax-style token-budget allocation across corpus sources.

Method source (public): Chung et al., "UniMax: Fairer and More
Effective Language Sampling for Large-Scale Multilingual Pretraining"
(ICLR 2023) — given a total token budget and a per-source epoch cap,
allocate the budget as uniformly as possible without any source
exceeding ``max_epochs`` repetitions of its data: small sources are
fully consumed (up to the cap), the rest of the budget spreads evenly
over the larger ones. The reference engine has no equivalent; this
complements ``mixture_sample`` (operators/keycount.py), which
MATERIALIZES a mixture once the weights are known.

Spark-first design: the waterfilling level has a closed form over the
per-source aggregate — sort sources by cap ascending, then

    level = max_j (budget - cum_cap_before_j) / (n - j + 1)
    alloc_i = min(cap_i, level)

so the whole computation is one groupBy(source) aggregation (the only
corpus-scale work, map-side combinable) followed by window arithmetic
over ONE ROW PER SOURCE — bounded metadata scale, which is why the
ordered single-partition window here is fine where it wasn't for
normalize_distribution's unbounded key table. Caps accumulate as
DECIMAL (epochs held at 6 dp), so the running sum is exact and
engine-order-independent; `level` and the final ratios are single IEEE
divisions of exact quantities — deterministic, hence oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wimbd_spark.operators.textqc import token_count


def unimax_allocation(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: float = 1.0,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token allocation → (source, tokens, cap, alloc,
    weight), where Σ alloc = min(budget, Σ cap), no source exceeds
    ``max_epochs`` · its token count, and the budget spreads uniformly
    over sources whose cap exceeds the water level.

    ``weight`` is alloc / budget — the sampling weight to feed a
    mixture materializer (e.g. ``mixture_sample``).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    per = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(source_col)
        .agg(F.sum(token_count(text_col)).alias("tokens"))
    )
    epochs = F.lit(f"{max_epochs:.6f}").cast("decimal(18,6)")
    capped = per.select(
        source_col,
        "tokens",
        (F.col("tokens") * epochs).alias("cap"),  # exact decimal
    )
    # one row per source from here on — bounded metadata scale. All
    # scalar context (n, level) rides unbounded frames over the SAME
    # single-partition window rather than agg+crossJoin: a crossJoin
    # would hang extra consumers off the per-source aggregate and
    # Catalyst re-executes the corpus aggregation once per consumer
    # (three corpus scans, pinned against in test_plans)
    w = Window.orderBy(F.col("cap").asc(), F.col(source_col).asc())
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        F.sum("cap")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    ordered = capped.select(
        source_col,
        "tokens",
        "cap",
        F.coalesce(cum, F.lit(0).cast("decimal(18,6)")).alias("cum_prev"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    lam_j = (F.lit(float(budget_tokens)) - F.col("cum_prev").cast("double")) / (
        F.col("n") - F.col("rn") + F.lit(1)
    )
    with_lam = ordered.withColumn("_lam_j", lam_j)
    return (
        with_lam.withColumn("level", F.max("_lam_j").over(w_all))
        .select(
            source_col,
            "tokens",
            F.col("cap").cast("double").alias("cap"),
            F.least(F.col("cap").cast("double"), F.col("level")).alias(
                "alloc"
            ),
        )
        .select(
            source_col,
            "tokens",
            "cap",
            F.round(F.col("alloc"), 6).alias("alloc"),
            F.round(
                F.col("alloc") / F.lit(float(budget_tokens)), 6
            ).alias("weight"),
        )
    )


def temperature_allocation(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-sampled mixture weights → (source, tokens, weight).

    Method source (public): the multilingual sampling rule of mT5/XLM-R
    (and the multi-corpus mixing of GPT-3 appx A): sample source i with

        w_i = n_i^alpha / Σ_j n_j^alpha

    ``alpha`` < 1 flattens the natural distribution toward uniform
    (alpha=0), alpha=1 keeps it proportional. Complements
    ``unimax_allocation`` (hard epoch caps) — this is the smooth
    exponent form; both feed ``mixture_sample``.

    Plan shape: ONE groupBy(source) token aggregation (the only
    corpus-scale work, map-side combinable) + arithmetic over one row
    per source — the denominator rides an unpartitioned window over
    the per-source rows, which is bounded-metadata scale here exactly
    as in unimax_allocation (and avoids a second execution of the
    corpus aggregation that a totals crossJoin would hang off it).
    Determinism: each n_i^alpha is rounded once to 6 dp and cast
    DECIMAL, the denominator is the exact DECIMAL sum of those, and
    the final weight is one IEEE division — oracle-hashable.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    per_src = df.groupBy(source_col).agg(
        F.coalesce(F.sum(token_count(F.col(text_col))), F.lit(0)).alias(
            "tokens"
        )
    )
    powed = per_src.select(
        source_col,
        "tokens",
        F.round(F.pow(F.col("tokens").cast("double"), F.lit(float(alpha))), 6)
        .cast("decimal(18,6)")
        .alias("_p"),
    )
    w_all = Window.partitionBy()
    return powed.select(
        source_col,
        "tokens",
        F.round(
            F.col("_p").cast("double")
            / F.sum("_p").over(w_all).cast("double"),
            6,
        ).alias("weight"),
    )
