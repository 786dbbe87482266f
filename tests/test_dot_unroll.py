"""Bit-parity pins for the r15 vector-math restructurings: the
unrolled codegen dot (``dot_attrs``), the unrolled ``sign_sketch``,
and the lambda-bound ``_unit`` must produce BIT-identical doubles to
their generic-fold twins for every input shape — matched widths,
non-unrolled widths, length mismatches, NULLs, NaN/Inf, ±0.0,
empty arrays."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

from wimbd_spark.operators.similarity import (
    _d_sql,
    _dot_unroll_dims,
    _fold_dot_sql,
    _lit_doubles,
    _unit,
    dot,
    dot_attrs,
    register_dot_width,
    sign_sketch,
)

SCHEMA = StructType(
    [
        StructField("a", ArrayType(DoubleType()), True),
        StructField("b", ArrayType(DoubleType()), True),
    ]
)

NAN = float("nan")
INF = float("inf")


def _vec(seed: int, d: int) -> list:
    return [math.sin(seed * 0.7 + i * 1.3) for i in range(d)]


def _edge_rows():
    rows = []
    # the unrolled width, a non-unrolled width, and tiny widths
    for d in sorted({*_dot_unroll_dims(), 3, 7, 96}):
        rows.append((_vec(1, d), _vec(2, d)))
    rows += [
        (None, _vec(3, 64)),  # NULL side
        (_vec(4, 64), None),
        (None, None),
        ([], []),  # empty
        (_vec(5, 64), _vec(6, 32)),  # length mismatch (zip_with pads)
        ([0.0, -0.0] * 32, [-0.0, 0.0] * 32),  # signed-zero fold edge
        ([NAN] + _vec(7, 63), _vec(8, 64)),  # NaN propagation
        ([INF, -INF] + _vec(9, 62), _vec(10, 64)),  # Inf arithmetic
        ([1e308] * 64, [1e308] * 64),  # overflow -> Inf identically
        ([5e-324, -5e-324] * 32, [1.0] * 64),  # subnormals
    ]
    return rows


def test_dot_attrs_bit_identical_to_fold(spark):
    df = spark.createDataFrame(_edge_rows(), SCHEMA)
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("f"),
        dot_attrs("a", "b").alias("u"),
    )
    bad = out.filter(
        "(f IS NULL) <> (u IS NULL) OR f <> u OR hash(f) <> hash(u)"
    ).count()
    assert bad == 0
    # NaN rows: both must be NaN (NaN <> NaN is false, check apart)
    nan_rows = out.filter("isnan(f) OR isnan(u)").collect()
    assert all(
        math.isnan(r["f"]) and math.isnan(r["u"]) for r in nan_rows
    )


def test_dot_attrs_unrolled_branch_actually_taken(spark):
    """The width-matched plan must contain the flat chain, not just
    the fold (guards the CASE wiring — a typo'd guard would silently
    run the slow branch everywhere and still pass parity)."""
    assert 64 in _dot_unroll_dims()
    df = spark.createDataFrame([(_vec(1, 64), _vec(2, 64))], SCHEMA)
    plan = (
        df.select(dot_attrs("a", "b").alias("d"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "CASE WHEN" in plan and "aggregate(" in plan


def test_registered_width_unrolls_and_stays_bit_identical(spark):
    """VERDICT r16 item 2: a NON-default width learned from the data
    (register_dot_width / the _infer_dim and _centroid_rows hooks)
    must (a) appear as the flat unrolled chain in the plan and
    (b) stay bit-identical to the generic fold."""
    from wimbd_spark.operators.similarity import (
        _DOT_UNROLL_LEARNED,
        _infer_dim,
    )

    d = 23  # not in the env default (64), small enough to eyeball
    df = spark.createDataFrame(
        [(_vec(1, d), _vec(2, d)), (_vec(3, d), _vec(4, d))], SCHEMA
    )
    try:
        # the probe hook registers the learned width
        assert _infer_dim(df, "a") == d
        assert d in _dot_unroll_dims()
        plan = (
            df.select(dot_attrs("a", "b").alias("x"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # the unrolled chain at the learned width is in the plan
        # (attributes print with expr ids: `a#0[22] * b#1[22]`)
        import re

        assert re.search(rf"a#\d+\[{d - 1}\] \* b#\d+\[{d - 1}\]", plan)
        assert re.search(rf"size\(a#\d+, false\) = {d}\b", plan)
        out = df.select(
            dot(F.col("a"), F.col("b")).alias("f"),
            dot_attrs("a", "b").alias("u"),
        )
        assert out.filter("hash(f) <> hash(u)").count() == 0
    finally:
        _DOT_UNROLL_LEARNED.pop(d, None)


def test_register_dot_width_bounds(spark):
    from wimbd_spark.operators.similarity import (
        _DOT_UNROLL_LEARNED,
        _DOT_UNROLL_MAX_DIM,
        _DOT_UNROLL_MAX_WIDTHS,
    )

    before = dict(_DOT_UNROLL_LEARNED)
    try:
        _DOT_UNROLL_LEARNED.clear()
        # out-of-range and junk widths are refused (fold handles them)
        assert not register_dot_width(0)
        assert not register_dot_width(-3)
        assert not register_dot_width(_DOT_UNROLL_MAX_DIM + 1)
        assert not register_dot_width(None)
        assert not register_dot_width("x")
        # env-pinned widths report covered without a learned entry
        assert register_dot_width(64)
        assert 64 not in _DOT_UNROLL_LEARNED
        # FIFO eviction caps the learned set
        for d in range(2, 2 + _DOT_UNROLL_MAX_WIDTHS + 3):
            assert register_dot_width(d)
        assert len(_DOT_UNROLL_LEARNED) == _DOT_UNROLL_MAX_WIDTHS
        assert 2 not in _DOT_UNROLL_LEARNED  # oldest evicted
    finally:
        _DOT_UNROLL_LEARNED.clear()
        _DOT_UNROLL_LEARNED.update(before)


def _norm0(v) -> bool:
    """True when the captured-norm division would divide by zero —
    ANSI mode makes BOTH _unit forms throw there (see the companion
    throw-parity test)."""
    if v is None or not v:
        return False
    s = math.fsum(x * x for x in v)
    return s == 0.0 or math.sqrt(s) == 0.0


def test_unit_bit_identical_to_captured_form(spark):
    rows = [(r[0],) for r in _edge_rows() if not _norm0(r[0])]
    schema = StructType(
        [StructField("a", ArrayType(DoubleType()), True)]
    )
    df = spark.createDataFrame(rows, schema)
    # the r14 captured-norm form, rebuilt verbatim
    n = F.sqrt(
        F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    old = F.transform(F.col("a"), lambda x: x / n)
    out = df.select(old.alias("o"), _unit(F.col("a")).alias("u"))
    bad = out.filter(
        "(o IS NULL) <> (u IS NULL) OR size(o) <> size(u) "
        "OR hash(o) <> hash(u)"
    ).count()
    assert bad == 0


def test_unit_zero_norm_throws_in_both_forms(spark):
    """ANSI divide-by-zero on a zero-norm vector: the lambda-bound
    _unit must fail exactly like the r14 captured form (both raise),
    not silently diverge."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    df = spark.createDataFrame(
        [([0.0] * 8,)],
        StructType([StructField("a", ArrayType(DoubleType()), True)]),
    )
    n = F.sqrt(
        F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    old = F.transform(F.col("a"), lambda x: x / n)
    for col in (old, _unit(F.col("a"))):
        with pytest.raises((Py4JJavaError, ArithmeticException)):
            df.select(col.alias("u")).collect()


def test_sign_sketch_matches_fold_loop(spark):
    planes = [_vec(100 + p, 64) for p in range(16)]
    rows = [(v,) for v, _ in _edge_rows()]
    schema = StructType(
        [StructField("a", ArrayType(DoubleType()), True)]
    )
    df = spark.createDataFrame(rows, schema)
    # the r14 per-plane F.when loop, rebuilt verbatim
    total = F.lit(0)
    for p, plane in enumerate(planes):
        arr = _lit_doubles(plane)
        total = total + F.when(
            dot(F.col("a"), arr) > 0, F.lit(2**p)
        ).otherwise(F.lit(0))
    out = df.select(
        total.cast("long").alias("o"),
        sign_sketch("a", planes).alias("u"),
    )
    assert out.filter("o <> u OR (o IS NULL) <> (u IS NULL)").count() == 0


def test_sign_sketch_empty_planes(spark):
    df = spark.createDataFrame(
        [(_vec(1, 8),)],
        StructType([StructField("a", ArrayType(DoubleType()), True)]),
    )
    assert df.select(sign_sketch("a", []).alias("s")).first()["s"] == 0


def test_d_sql_round_trips(spark):
    vals = [0.0, -0.0, NAN, INF, -INF, 5e-324, -5e-324, 1.7976931348623157e308, 1/3]
    got = spark.sql(
        "SELECT " + ", ".join(
            f"{_d_sql(v)} AS c{i}" for i, v in enumerate(vals)
        )
    ).first()
    import struct

    for i, v in enumerate(vals):
        assert struct.pack("d", got[f"c{i}"]) == struct.pack("d", v)


def test_nearest_centroids_bit_identical_to_captured_form(spark):
    """The lambda-bound _nearest_centroids must rank and score
    bit-identically to the r14 captured-cosine form on edge vectors."""
    from wimbd_spark.operators.similarity import (
        _centroid_literal,
        _nearest_centroids,
        cosine,
    )

    cents = [
        {"centroid_id": i, "_cent": _vec(50 + i, 64)} for i in range(16)
    ]
    cent_arr = _centroid_literal(cents)
    rows = [(r[0],) for r in _edge_rows() if r[0] and not _norm0(r[0])]
    schema = StructType(
        [StructField("a", ArrayType(DoubleType()), True)]
    )
    df = spark.createDataFrame(rows, schema)
    old = F.slice(
        F.array_sort(
            F.transform(
                cent_arr,
                lambda c: F.struct(
                    (-cosine(F.col("a"), c["v"])).alias("neg"),
                    c["cid"].alias("cid"),
                ),
            )
        ),
        1,
        4,
    )
    out = df.select(
        old.alias("o"),
        _nearest_centroids(F.col("a"), cent_arr, 4).alias("u"),
    )
    # hash() compares full nested struct values incl. the neg doubles
    bad = out.filter(
        "(o IS NULL) <> (u IS NULL) OR hash(o) <> hash(u)"
    ).count()
    assert bad == 0
