"""Distributed Lloyd's k-means over an embedding column.

The similarity/IVF tier (operators/similarity.py) picks its centroids
by deterministic hash sample — cheap and good enough for routing, but
not a fitted clustering. This module runs real Lloyd iterations on
top of the same deterministic seeding, giving the data-curation jobs
that want *fitted* clusters (cluster-balanced sampling, SemDeDup-style
pruning, corpus cartography) a proper k-means while staying exactly
reproducible — every run, partition layout, and the DuckDB oracle
produce identical assignments. No reference equivalent (the reference
has no embedding operators at all).

Spark-first shape, per iteration:

* **assign** — centroids ride the plan as ONE literal
  array<struct<cid, v>> (same trick as the IVF tier); the argmin over
  squared L2 is a pure collection expression (`transform` +
  `array_min` struct ordering), map-only, zero shuffle, no UDF.
* **update** — `posexplode` the vector and aggregate per (cluster,
  dim): ONE shuffle of partial sums whose width is n_clusters x dim
  rows, independent of corpus size. Components are rounded to 9 dp
  and summed as DECIMAL, so the per-cluster mean is order-independent
  (bit-identical under any partitioning — and reproducible by the
  oracle, which mirrors the same decimal sum). Only the
  n_clusters x dim aggregate rows reach the driver.

Determinism contract (what makes the oracle exact):
seeds = the ``n_clusters`` rows with the smallest (hash32(id), id) —
cluster ids are the seed row ids; new centroid component =
float(decimal_sum) / count, a single IEEE division both engines
perform on identical inputs; empty clusters keep their previous
centroid; assignment ties break toward the smaller cluster id.
Cross-engine argmin agreement additionally needs a best-vs-second
distance margin (same guard as the IVF tier's
test_centroid_assignment_margin) — asserted for the registry
parameters in tests/test_clustering.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wimbd_spark.operators.similarity import (
    _centroid_rows,
    _to_double,
)

SUM_SCALE = 9  # component rounding before the exact decimal sum


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance — left-to-right fold, no sqrt (monotone for
    argmin, one less op per comparison)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cent_literal(cents: list[tuple[int, list[float]]]) -> Column:
    from wimbd_spark.operators.similarity import _lit_doubles

    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                _lit_doubles(v).alias("v"),
            )
            for cid, v in cents
        ]
    )


def _cluster_col(
    centroids: list[tuple[int, list[float]]], vec_col: str
) -> Column:
    """argmin-squared-L2 centroid id of ``vec_col`` (ties to the
    smaller cluster id) as a pure Column — shared by assignment and
    the fit loop so the update pass can attach the cluster WITHOUT
    re-joining the corpus against its own assignment (r15: the old
    join-back added one self-join per Lloyd iteration)."""
    v = _to_double(F.col(vec_col))
    scored = F.transform(
        _cent_literal(centroids),
        lambda c: F.struct(
            l2sq(v, c["v"]).alias("d"), c["cid"].alias("cid")
        ),
    )
    return F.array_min(scored)["cid"]


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cluster): each vector's argmin-squared-L2 centroid,
    ties to the smaller cluster id. Map-only projection."""
    return df.select(
        F.col(id_col),
        _cluster_col(centroids, vec_col).alias("cluster"),
    )


def kmeans_fit(
    df: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """``n_iter`` Lloyd iterations from the deterministic hash seeds;
    returns the fitted centroids as (cluster_id, vector) pairs.

    Each iteration runs one assign+update job (one bounded shuffle);
    the driver only ever holds n_clusters x dim aggregate cells.
    """
    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    seeds = _centroid_rows(df, id_col, vec_col, n_clusters)
    cents = [(r["centroid_id"], list(r["_cent"])) for r in seeds]
    if not cents:
        return []
    for _ in range(n_iter):
        # cluster attached as a map-only expression — no join of the
        # corpus against its own assignment (r15); the iteration is
        # scan → assign → posexplode → partial-agg → k×dim shuffle
        comp = (
            df.select(
                _cluster_col(cents, vec_col).alias("cluster"),
                F.posexplode(_to_double(F.col(vec_col))).alias(
                    "pos", "val"
                ),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(
                    F.round(F.col("val"), SUM_SCALE).cast(
                        "decimal(20,9)"
                    )
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in comp:
            by_cid.setdefault(r["cluster"], {})[r["pos"]] = float(
                r["s"]
            ) / r["n"]
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in range(len(old))]
                if cid in by_cid
                else old,  # empty cluster keeps its centroid
            )
            for cid, old in cents
        ]
    return cents


def kmeans(
    df: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (id_col, cluster), cluster = the seed
    row id of the fitted centroid. Integer-only output (float-free,
    so oracle hashing is exact)."""
    cents = kmeans_fit(df, n_clusters, n_iter, id_col, vec_col)
    if not cents:
        return df.select(
            F.col(id_col), F.lit(None).cast("long").alias("cluster")
        ).where(F.lit(False))
    return assign_clusters(df, cents, id_col, vec_col)


def l2sq_nano(a: Column, b: Column) -> Column:
    """Squared L2 distance in integer NANO units: each per-dimension
    term (x-y)^2 * 1e9 is rounded to the nearest integer and summed as
    BIGINT. Every term is a product/difference of bit-identical
    doubles (no libm), so both engines round the SAME double to the
    SAME integer, and the integer sum is exact and order-independent —
    unlike a float fold, whose summation order/algorithm differs
    across engines and whose 6dp-rounded total sat on rounding-grid
    midpoints (the r8/r9 driver-red mechanism). The only residual
    hazard is a term landing EXACTLY on x.5 nano, audited at every
    oracle-checked SF by tests/test_clustering.py."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.round((x - y) * (x - y) * F.lit(1e9), 0)
            .cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_cluster_stats(
    df: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n_members, inertia_nano): size and within-cluster sum
    of squared distances per fitted cluster, in integer nano units
    (see ``l2sq_nano`` — exact, order-independent, float-free output
    so oracle hashing is exact)."""
    cents = kmeans_fit(df, n_clusters, n_iter, id_col, vec_col)
    if not cents:
        return df.sparkSession.createDataFrame(
            [], "cluster long, n_members long, inertia_nano long"
        )
    v = _to_double(F.col(vec_col))
    scored = F.transform(
        _cent_literal(cents),
        lambda c: F.struct(
            l2sq(v, c["v"]).alias("d"),
            c["cid"].alias("cid"),
            l2sq_nano(v, c["v"]).alias("dn"),
        ),
    )
    best = F.array_min(scored)
    return (
        df.select(
            best["cid"].alias("cluster"),
            best["dn"].alias("dn"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dn").alias("inertia_nano"),
        )
    )
