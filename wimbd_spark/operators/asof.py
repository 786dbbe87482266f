"""As-of and interval (range) joins — time-series join operators.

The reference engine is batch-only over static text corpora and has no
temporal join surface; these are green-field extensions in the same
family as operators/windows.py (SURVEY.md §2.4 names as-of/range joins
as native-Spark-expressible set operations). Both operators are built
for the 100 TB posture:

* ``asof_join`` uses the union-tag + ordered-window trick: ONE shuffle
  on the join key, no range self-join, no broadcast requirement on
  either side. Each left row picks up the latest preceding right row
  via ``last(..., ignorenulls=True)`` over an ordering that interleaves
  both sides. This is the standard scalable as-of plan (a sort-merge
  within key partitions); skew follows the key distribution exactly
  like any per-key window.

* ``interval_join`` equi-joins on (key, time-bucket) after exploding
  each left row into the <=3 buckets its window can touch, then
  re-filters exactly. Shuffle volume = one equi-join with a small
  constant duplicate factor — never a cross product, never a
  BroadcastNestedLoopJoin (which is what a raw inequality join
  becomes in OSS Spark).

All window math is integer epoch MICROSECONDS (unix_micros) so a
DuckDB oracle reproduces identical results (epoch_us both sides),
matching the convention in operators/windows.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _us(col: str) -> Column:
    return F.unix_micros(F.col(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    strict: bool = False,
    tolerance_s: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) sharing the join
    key(s). Unmatched left rows keep NULL right columns (left outer
    as-of semantics).

    Ties among right rows at the same timestamp resolve to the
    greatest ``tiebreak`` value (pass a unique id column for
    determinism). ``tolerance_s`` drops matches older than the
    window (match becomes NULL, the left row stays).

    Returns left columns + ``{prefix}{c}`` for each right column in
    ``right_cols`` (default: all non-key, non-ts right columns) +
    ``{prefix}ts_us`` (matched right timestamp, epoch µs).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload = F.struct(
        _us(right_ts).alias("__ts_us"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    # side ordering at equal ts: inclusive -> right sorts BEFORE left
    # (visible); strict -> right sorts AFTER left (invisible).
    r_side, l_side = (0, 1) if not strict else (1, 0)
    if tiebreak is not None:
        # order on the column's NATIVE type: the old cast("long")
        # turned a string id into NULL silently, making equal-ts ties
        # nondeterministic (r9 ADVICE). Any orderable type works;
        # maps are the one unorderable Spark type.
        from pyspark.sql.types import MapType

        tb_type = right.select(
            F.col(tiebreak).alias("t")
        ).schema["t"].dataType
        if isinstance(tb_type, MapType):
            raise TypeError(
                f"tiebreak column {tiebreak!r} has unorderable type "
                f"{tb_type.simpleString()}"
            )
        tb = F.col(tiebreak)
    else:
        from pyspark.sql.types import LongType

        tb_type = LongType()
        tb = F.lit(0).cast("long")

    lhs = left.select(
        *[F.col(k) for k in keys],
        _us(left_ts).alias("__t"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        _us(right_ts).alias("__t"),
        F.lit(r_side).alias("__side"),
        tb.alias("__tb"),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
        payload.alias("__r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__side").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    matched = merged.where(F.col("__side") == l_side)

    m = F.col("__m")
    if tolerance_s is not None:
        tol_us = int(tolerance_s) * 1_000_000
        m = F.when(
            (F.col("__t") - F.col("__m.__ts_us")) <= F.lit(tol_us),
            F.col("__m"),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(m["__ts_us"].alias(f"{prefix}ts_us"))
    out_cols.extend(m[c].alias(f"{prefix}{c}") for c in right_cols)
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -600,
    upper_s: int = 0,
    prefix: str = "r_",
) -> DataFrame:
    """Inner join left to every right row with the same key(s) and
    ``right.ts`` in ``[left.ts + lower_s, left.ts + upper_s]``
    (bounds inclusive, seconds).

    Plan shape: right rows land in fixed time buckets of width
    (upper_s - lower_s); each left row's window spans at most 2
    bucket boundaries, so the left side explodes into <=3 bucket
    probes and the join is a plain equi-join on (keys..., bucket)
    followed by an exact range re-filter. No inequality join, no
    nested-loop fallback.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    keys = [on] if isinstance(on, str) else list(on)
    width_us = max((upper_s - lower_s) * 1_000_000, 1)
    lo_us = lower_s * 1_000_000
    hi_us = upper_s * 1_000_000

    r = right.select(
        *[F.col(k) for k in keys],
        _us(right_ts).alias("__rt"),
        F.struct(
            *[
                F.col(c)
                for c in right.columns
                if c not in keys and c != right_ts
            ]
        ).alias("__r"),
    ).withColumn("__bucket", F.floor(F.col("__rt") / width_us))

    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.col(k) for k in keys],
        _us(left_ts).alias("__lt"),
    )
    buckets = F.sequence(
        F.floor((F.col("__lt") + lo_us) / width_us),
        F.floor((F.col("__lt") + hi_us) / width_us),
    )
    l = l.withColumn("__bucket", F.explode(buckets))

    joined = l.join(r, on=keys + ["__bucket"], how="inner").where(
        (F.col("__rt") >= F.col("__lt") + lo_us)
        & (F.col("__rt") <= F.col("__lt") + hi_us)
    )
    rc = [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__rt").alias(f"{prefix}ts_us"),
        *[F.col(f"__r.{c}").alias(f"{prefix}{c}") for c in rc],
    )
