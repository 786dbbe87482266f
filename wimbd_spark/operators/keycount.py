"""The key-count analysis family.

Parity: the whole wimbd/*/map_count.py + reduce_count.py substrate —
every analysis is `project a key per document → count per key`
(e.g. wimbd/url_counts/reduce_count.py:8-15). The GNU-parallel mapper
fan-out + single-reducer pipe becomes map tasks + shuffle to parallel
reducers; partial aggregation is automatic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def key_count(
    df: DataFrame,
    key: Column | str,
    key_name: str = "key",
    explode: bool = False,
) -> DataFrame:
    """Universal key-count: (key, count) sorted by count desc, key asc.

    ``explode=True`` for array-valued keys (e.g. tokens per doc —
    wimbd/url_per_tok_counts/map_count.py:18-22).
    """
    k = F.col(key) if isinstance(key, str) else key
    if explode:
        k = F.explode(k)
    return (
        df.select(k.alias(key_name))
        .filter(F.col(key_name).isNotNull())
        .groupBy(key_name)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col(key_name).asc())
    )


def sample_by_hash(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows where
    hash32(key) mod denom < fraction·denom.

    The reference samples with `random() < fraction`
    (wimbd/random_sample/map_count.py:10-14); a hash-gate gives the
    same marginal rate but is reproducible across runs, engines, and
    retries — the property a 100 TB pipeline actually needs (and what
    makes the DuckDB oracle able to agree exactly). For true
    randomness use df.sample(fraction, seed).
    """
    from wimbd_spark.functions.text import hash32

    k = F.col(key) if isinstance(key, str) else key
    return df.filter(hash32(k) % denom < int(fraction * denom))


def id_lookup(
    df: DataFrame, ids: list, id_col: str = "doc_id"
) -> DataFrame:
    """Random access by id list (≙ es.mget, wimbd/es/random_access.py:
    7-23). Small id lists fold into an `isin` scan predicate (pushed
    to parquet); large ones should broadcast-semi-join instead."""
    if len(ids) <= 1000:
        return df.filter(F.col(id_col).isin(ids))
    wanted = df.sparkSession.createDataFrame([(i,) for i in ids], [id_col])
    return df.join(F.broadcast(wanted.distinct()), id_col, "left_semi")


def normalize_distribution(counts: DataFrame, count_col: str = "count") -> DataFrame:
    """counts → probability distribution (count / Σcount).

    Parity: wimbd/sentence_lengths/summarize.py:30-40.
    Single-partition window over an already-aggregated (small) relation.
    """
    total = Window.partitionBy()
    return counts.withColumn(
        "p", F.col(count_col) / F.sum(count_col).over(total)
    )
