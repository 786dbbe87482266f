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


def normalize_distribution(counts: DataFrame, count_col: str = "count") -> DataFrame:
    """counts → probability distribution (count / Σcount).

    Parity: wimbd/sentence_lengths/summarize.py:30-40.
    Single-partition window over an already-aggregated (small) relation.
    """
    total = Window.partitionBy()
    return counts.withColumn(
        "p", F.col(count_col) / F.sum(count_col).over(total)
    )
