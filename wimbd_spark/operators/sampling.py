"""Weighted sampling without replacement (A-ES / exponential sort).

Method source (public): Efraimidis & Spirakis, "Weighted random
sampling with a reservoir" (IPL 2006): draw u_i ~ Uniform(0,1], rank
items by u_i^(1/w_i) descending, take the top-k — the selection
distribution is exactly weighted sampling without replacement. We rank
on the monotone-equivalent EXPONENTIAL key

    e_i = -ln(u_i) / w_i        (e_i ~ Exp(w_i))

ASCENDING: the k smallest e_i are exactly the A-ES winners (ln is
strictly increasing, so u^(1/w) desc == ln(u)/w desc == -ln(u)/w asc).
The reference engine only has unweighted `random() < p` thinning
(wimbd/random_sample/map_count.py:10-14); weighted selection is the
missing half of data mixing — "sample 10M docs proportional to
quality score" — so this is a beyond-reference extension in the same
family as ``sample_by_hash`` / ``stratified_sample``
(operators/keycount.py).

Why the exponential form and not the rounded u^(1/w) used through
round 9 — two measured failure modes of ``round(pow(u, 1/w), 6)``:

* dynamic-range collapse: for w >~ 1e4 (real document char counts)
  u^(1/w) is 1 - ln(1/u)/w + O(w^-2), so EVERY key rounds to
  1.000000 at 6 dp and the "weighted" sample degenerates to
  lowest-id-first; at sf0.1, 5,000 docs already produced only 3,777
  distinct keys (24% collisions).
* rounding-grid fragility: pre-rounded keys sat as close as 3.7e-10
  to a 0.5e-6 rounding midpoint, so a 1-ulp libm pow() difference
  between engines flipped the rounded value (the r8/r9 driver-red
  mechanism).

e = -ln(u)/w keeps the full double dynamic range at ANY weight — no
rounding is applied to the ranking key at all. Cross-engine agreement
is therefore ORDER agreement: u is integer-hash-exact on both
engines, ln/divide differ by <= ~3 ulp (~1e-15 relative), and the
adjacent-key relative gaps near the selection boundary are ~1e-2 for
real corpora — audited explicitly at every oracle-checked SF by
tests/test_sampling_clustering.py::test_sample_key_order_margin.
Oracle-compared outputs emit the integer RANK, never the float key.

Determinism: u_i comes from the portable md5-based ``hash32`` of the
row key (never ``rand()``), so every run, engine, retry, and the
DuckDB oracle pick the SAME rows; a different ``salt`` draws an
independent sample. Ties on the key (probability ~2^-32) break on the
row key ascending.

Plan shape at 100 TB: the key is a map-side projection; global top-k
compiles to TakeOrderedAndProject (per-partition heap + driver merge
of k rows — no full sort, no extra shuffle); the rank column is a
single-partition window over the ALREADY-LIMITED k rows (bounded).
The per-group variant is one window shuffle on the group key, the
same cost class as any per-group top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_U_DENOM = 4294967296.0  # 2^32: hash32 in [0, 2^32) -> u in (0, 1]


def sample_key(
    weight: Column | str, key: Column | str, salt: str = ""
) -> Column:
    """The exponential A-ES ranking key e = -ln(u)/w (SMALLER wins).

    ``u = (hash32(key [salted]) + 1) / 2^32`` — uniform on (0, 1],
    never 0, so the log is always finite. Rows with NULL or
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
    return F.when(wd > 0, -F.log(u) / wd)


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

    Output: input columns + ``sample_key`` (the exponential key the
    row won on, ascending) + ``sample_rank`` (1-based selection
    order). Ties on the key break on ``key`` ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sk = sample_key(weight, key, salt)
    picked = (
        df.withColumn("sample_key", sk)
        .where(F.col("sample_key").isNotNull())
        .orderBy(F.col("sample_key").asc(), F.col(key).asc())
        .limit(k)
    )
    # bounded window: <= k rows survive the limit above
    w = Window.orderBy(F.col("sample_key").asc(), F.col(key).asc())
    return picked.withColumn(
        "sample_rank", F.row_number().over(w)
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
    draw. One window shuffle on the group key; ``sample_rank`` is the
    1-based selection order within the group.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sk = sample_key(weight, key, salt)
    w = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").asc(), F.col(key).asc()
    )
    return (
        df.withColumn("sample_key", sk)
        .where(F.col("sample_key").isNotNull())
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
