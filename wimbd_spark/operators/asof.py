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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row sharing the join
    key(s), by ``direction`` (the pandas ``merge_asof`` directions):

    * ``backward`` (default): most recent right with
      ``right.ts <= left.ts`` (``<`` when ``strict``);
    * ``forward``: earliest right with ``right.ts >= left.ts``
      (``>`` when ``strict``);
    * ``nearest``: whichever of the two is closer in time; exact ties
      in distance resolve backward (pandas convention). ``strict`` is
      not supported with nearest (raise) — exclude exact matches by
      pre-filtering instead.

    Unmatched left rows keep NULL right columns (left outer as-of
    semantics).

    Ties among right rows at the same timestamp resolve to the
    greatest ``tiebreak`` value for backward matches and the SMALLEST
    for forward matches (each side's natural scan order; pass a unique
    id column for determinism). ``tolerance_s`` drops matches farther
    than the window in the match direction (match becomes NULL, the
    left row stays).

    Returns left columns + ``{prefix}{c}`` for each right column in
    ``right_cols`` (default: all non-key, non-ts right columns) +
    ``{prefix}ts_us`` (matched right timestamp, epoch µs).

    Plan shape is ONE key shuffle for every direction: forward is the
    mirrored window frame (first-following instead of last-preceding)
    over the same union; nearest evaluates both frames over the same
    sorted partition and picks per-row — still no self-join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError("strict is not supported with nearest")
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

    # side ordering at equal ts, per direction:
    # backward/nearest: inclusive -> right sorts BEFORE left (visible
    #   to the preceding frame); strict backward -> right AFTER left.
    # forward: inclusive -> right sorts AFTER left (visible to the
    #   following frame); strict forward -> right BEFORE left.
    if direction == "forward":
        r_side, l_side = (1, 0) if not strict else (0, 1)
    else:
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

    order = [
        F.col("__t").asc(),
        F.col("__side").asc(),
        F.col("__tb").asc_nulls_first(),
    ]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    tol_us = (
        None if tolerance_s is None else int(tolerance_s) * 1_000_000
    )

    def within(cand, dist):
        # tolerance applies PER CANDIDATE (pandas: a too-far candidate
        # is no candidate at all — nearest may then take the other
        # direction's match instead)
        if tol_us is None:
            return cand
        return F.when(dist <= F.lit(tol_us), cand)

    mb = within(
        F.last("__r", ignorenulls=True).over(w_back),
        F.col("__t") - F.last("__r", ignorenulls=True).over(w_back)[
            "__ts_us"
        ],
    )
    mf = within(
        F.first("__r", ignorenulls=True).over(w_fwd),
        F.first("__r", ignorenulls=True).over(w_fwd)["__ts_us"]
        - F.col("__t"),
    )
    merged = lhs.unionByName(rhs)
    if direction == "backward":
        merged = merged.withColumn("__m", mb)
    elif direction == "forward":
        merged = merged.withColumn("__m", mf)
    else:  # nearest: both frames over the SAME sorted partition
        merged = merged.withColumn(
            "__m",
            F.when(mf.isNull(), mb)
            .when(mb.isNull(), mf)
            .when(
                # backward wins distance ties (pandas convention)
                (F.col("__t") - mb["__ts_us"])
                <= (mf["__ts_us"] - F.col("__t")),
                mb,
            )
            .otherwise(mf),
        )
    matched = merged.where(F.col("__side") == l_side)

    m = F.col("__m")
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
