"""Weighted sampling (A-ES) and distributed k-means."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.clustering import (
    assign_clusters,
    kmeans,
    kmeans_cluster_stats,
    kmeans_fit,
)
from wimbd_spark.operators.sampling import (
    sample_key,
    weighted_sample,
    weighted_sample_by,
)

# --------------------------------------------------- weighted sample


def _wdf(spark, n=400):
    rows = [(i, "g%d" % (i % 2), float((i % 4) + 1)) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "grp", "w"])


def test_weighted_sample_exact_k_and_deterministic(spark):
    df = _wdf(spark)
    a = weighted_sample(df, 25, "w").collect()
    b = weighted_sample(df, 25, "w").collect()
    assert len(a) == 25
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    # sample_key column present, in (0, 1]
    assert all(0 < r.sample_key <= 1 for r in a)


def test_weighted_sample_salt_draws_differ(spark):
    df = _wdf(spark)
    a = {r.doc_id for r in weighted_sample(df, 25, "w", salt="a").collect()}
    b = {r.doc_id for r in weighted_sample(df, 25, "w", salt="b").collect()}
    assert a != b


def test_weighted_sample_nonpositive_weight_never_picked(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 1e-9)],
        ["doc_id", "w"],
    )
    got = weighted_sample(df, 10, "w").collect()
    assert [r.doc_id for r in got] == [4]


def test_weighted_sample_weight_proportionality(spark):
    # Across many independent draws (salts), weight-4 items must be
    # picked far more often than weight-1 items (exp check, not exact).
    df = _wdf(spark, n=200)  # weights cycle 1,2,3,4
    hits = {1.0: 0, 4.0: 0}
    w_by_id = {i: float((i % 4) + 1) for i in range(200)}
    for s in range(8):
        for r in weighted_sample(df, 30, "w", salt=str(s)).collect():
            w = w_by_id[r.doc_id]
            if w in hits:
                hits[w] += 1
    assert hits[4.0] > 2 * hits[1.0]


def test_weighted_sample_by_group_counts(spark):
    df = _wdf(spark)  # 2 groups x 200 rows
    got = weighted_sample_by(df, 7, "w", group_col="grp").collect()
    per = {}
    for r in got:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert per == {"g0": 7, "g1": 7}


def test_weighted_sample_by_small_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 1.0), (3, "b", 1.0)],
        ["doc_id", "grp", "w"],
    )
    got = weighted_sample_by(df, 5, "w", group_col="grp").collect()
    per = {}
    for r in got:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert per == {"a": 2, "b": 1}


def test_sample_key_matches_formula(spark):
    import hashlib

    df = spark.createDataFrame([(7, 2.0)], ["doc_id", "w"])
    got = df.select(sample_key("w", "doc_id").alias("k")).collect()[0].k
    h = int(hashlib.md5(b"7").hexdigest()[:8], 16)
    u = (h + 1) / 4294967296.0
    assert got == pytest.approx(round(u ** 0.5, 6), abs=1e-9)


# ------------------------------------------------------------ kmeans


def _emb(spark, sf_dir="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _np_kmeans(ids, vecs, n_clusters, n_iter):
    """Independent NumPy reimplementation of the determinism contract."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    order = sorted(
        range(len(ids)),
        key=lambda i: (
            int(hashlib.md5(str(ids[i]).encode()).hexdigest()[:8], 16),
            ids[i],
        ),
    )
    seeds = order[:n_clusters]
    cents = [(ids[i], [float(x) for x in vecs[i]]) for i in seeds]

    def assign_all(cents):
        out = []
        for v in vecs:
            best = None
            for cid, c in cents:
                d = float(
                    sum((float(a) - b) * (float(a) - b) for a, b in zip(v, c))
                )
                if best is None or (d, cid) < best:
                    best = (d, cid)
            out.append(best[1])
        return out

    q = Decimal(1).scaleb(-9)
    for _ in range(n_iter):
        a = assign_all(cents)
        sums, counts = {}, {}
        for v, cid in zip(vecs, a):
            counts[cid] = counts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [Decimal(0)] * len(v))
            for p, x in enumerate(v):
                acc[p] += Decimal(float(x)).quantize(q, ROUND_HALF_UP)
        cents = [
            (
                cid,
                [float(s) / counts[cid] for s in sums[cid]]
                if cid in sums
                else old,
            )
            for cid, old in cents
        ]
    return cents, assign_all(cents)


def test_kmeans_matches_numpy_reference(spark):
    emb = _emb(spark)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    vecs = [r.embedding for r in rows]
    ref_cents, ref_assign = _np_kmeans(ids, vecs, 8, 2)
    got_cents = kmeans_fit(emb, n_clusters=8, n_iter=2)
    assert [c for c, _ in got_cents] == [c for c, _ in ref_cents]
    for (_, gv), (_, rv) in zip(got_cents, ref_cents):
        np.testing.assert_allclose(gv, rv, rtol=0, atol=1e-12)
    got = {
        r.vec_id: r.cluster
        for r in kmeans(emb, n_clusters=8, n_iter=2).collect()
    }
    assert got == dict(zip(ids, ref_assign))


def test_kmeans_iterations_reduce_inertia(spark):
    emb = _emb(spark)
    def inertia(n_iter):
        rows = kmeans_cluster_stats(emb, 8, n_iter).collect()
        return float(sum(r.inertia6 for r in rows))
    i0, i2 = inertia(0), inertia(2)
    assert i2 < i0


def test_kmeans_assignment_margin(spark):
    """Cross-engine argmin agreement guard: best vs second-best squared
    distance must be separated at every oracle-checked SF (mirrors
    test_centroid_assignment_margin for the IVF tier)."""
    from wimbd_spark.operators.clustering import _cent_literal, l2sq
    from wimbd_spark.operators.similarity import _to_double

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = _emb(spark, sf_dir)
        cents = kmeans_fit(emb, 8, 2)
        v = _to_double(F.col("embedding"))
        ds = F.array_sort(
            F.transform(_cent_literal(cents), lambda c: l2sq(v, c["v"]))
        )
        m = emb.select(
            F.min(ds[1] - ds[0]).alias("margin")
        ).collect()[0].margin
        # cross-engine distance computation differs only by summation-
        # order float noise (~1e-15 on O(1) distances); any margin a
        # few orders above that cannot flip the argmin. Observed mins:
        # 3.4e-8 at sf0.001, 8.8e-5 at sf0.01.
        assert m > 1e-11, f"{sf_dir}: margin {m}"


def test_kmeans_empty_and_single(spark):
    emb = _emb(spark)
    empty = emb.where(F.lit(False))
    assert kmeans(empty, 4, 2).count() == 0
    assert kmeans_fit(empty, 4, 2) == []
    one = emb.limit(1)
    cents = kmeans_fit(one, 4, 2)
    assert len(cents) == 1
    got = kmeans(one, 4, 2).collect()
    assert got[0].cluster == cents[0][0]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # 3 clusters from 3 seeds, but all points sit in one tight blob ->
    # after an update some clusters may empty; fit must not crash and
    # must keep previous centroids for them.
    rows = [(i, [float(i % 2) * 0.01, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_fit(df, 3, 2, vec_col="embedding")
    assert len(cents) == 3
    out = kmeans(df, 3, 2).collect()
    assert len(out) == 6


def test_temperature_allocation(spark):
    from wimbd_spark.operators.mixture import temperature_allocation

    df = spark.createDataFrame(
        [("a", "x " * 99 + "x"), ("b", "y"), ("c", None)],
        ["source", "text"],
    )
    rows = {r.source: r for r in temperature_allocation(df, alpha=0.5).collect()}
    assert rows["a"].tokens == 100 and rows["b"].tokens == 1
    assert rows["c"].tokens == 0
    # 100^.5=10, 1^.5=1, 0^.5=0 -> weights 10/11, 1/11, 0
    assert rows["a"].weight == round(10 / 11, 6)
    assert rows["b"].weight == round(1 / 11, 6)
    assert rows["c"].weight == 0.0
    # alpha=0 flattens to uniform over sources (0^0=1 in IEEE pow)
    flat = {r.source: r.weight for r in temperature_allocation(df, alpha=0.0).collect()}
    assert all(w == round(1 / 3, 6) for w in flat.values())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_allocation(df, alpha=-0.1)
