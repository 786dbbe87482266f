"""Weighted sampling without replacement (A-ES / exponential sort).

Method source (public): Efraimidis & Spirakis, "Weighted random
sampling with a reservoir" (IPL 2006): draw u_i ~ Uniform(0,1], rank
items by key_i = u_i^(1/w_i), take the top-k — the selection
distribution is exactly weighted sampling without replacement. The
reference engine only has unweighted `random() < p` thinning
(wimbd/random_sample/map_count.py:10-14); weighted selection is the
missing half of data mixing — "sample 10M docs proportional to
quality score" — so this is a beyond-reference extension in the same
family as ``sample_by_hash`` / ``stratified_sample``
(operators/keycount.py).

Determinism: u_i comes from the portable md5-based ``hash32`` of the
row key (never ``rand()``), so every run, engine, retry, and the
DuckDB oracle pick the SAME rows; a different ``salt`` draws an
independent sample. The ranking key is rounded to 6 dp and ties break
on the row key, keeping the order reproducible across engines.

Plan shape at 100 TB: the key is a map-side projection; global top-k
compiles to TakeOrderedAndProject (per-partition heap + driver merge
of k rows — no full sort, no extra shuffle). The per-group variant is
one window shuffle on the group key, the same cost class as any
per-group top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_U_DENOM = 4294967296.0  # 2^32: hash32 in [0, 2^32) -> u in (0, 1]


def sample_key(
    weight: Column | str, key: Column | str, salt: str = ""
) -> Column:
    """The A-ES ranking key u^(1/w), rounded to 6 dp.

    ``u = (hash32(key [salted]) + 1) / 2^32`` — uniform on (0, 1],
    never 0, so the power is always defined. Rows with NULL or
    non-positive weight get a NULL key (dropped by the samplers:
    weight 0 means "never pick").
    """
    from wimbd_spark.functions.text import hash32

    w = F.col(weight) if isinstance(weight, str) else weight
    k = F.col(key) if isinstance(key, str) else key
    u = (
        hash32(k.cast("string"), salt=salt if salt else None) + F.lit(1)
    ) / F.lit(_U_DENOM)
    wd = w.cast("double")
    return F.when(
        wd > 0, F.round(F.pow(u, F.lit(1.0) / wd), 6)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight: Column | str,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly ``k`` rows (fewer if the positive-weight population is
    smaller), drawn without replacement with probability proportional
    to ``weight``. Deterministic: same inputs -> same rows.

    Output: input columns + ``sample_key`` (the rounded A-ES key the
    row won on). Ties on the rounded key break on ``key`` ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sk = sample_key(weight, key, salt)
    return (
        df.withColumn("sample_key", sk)
        .where(F.col("sample_key").isNotNull())
        .orderBy(F.col("sample_key").desc(), F.col(key).asc())
        .limit(k)
    )


def weighted_sample_by(
    df: DataFrame,
    k: int,
    weight: Column | str,
    group_col: str = "source",
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """``weighted_sample`` within each group: up to ``k`` rows per
    value of ``group_col``, weight-proportional, deterministic — the
    weighted companion to ``stratified_sample``'s uniform per-group
    draw. One window shuffle on the group key.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sk = sample_key(weight, key, salt)
    w = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").desc(), F.col(key).asc()
    )
    return (
        df.withColumn("sample_key", sk)
        .where(F.col("sample_key").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
