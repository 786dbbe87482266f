"""knn_join block-GEMM path (r16): parity, routing, and the bitwise
cosine argument.

The block scorer replaces the |queries|·n_probe·avg_list row-at-a-time
codegen'd dot stage with per-(centroid, sub-list) numpy blocks whose
dimension-sequential accumulation performs the SAME IEEE multiplies
and left-associated adds as dot_attrs' unrolled chain — so cosines are
bit-identical doubles and the in-block top-k prune keeps exactly the
rows the global rank window keeps. These tests pin that argument."""

import pytest
from pyspark.sql import functions as F


def _fixture(spark, tmp_path, name="bg", n=60, dim=8, ncent=4):
    from wimbd_spark.operators.similarity import build_ivf_index

    rows = [
        (
            i,
            [
                float(((i * 37 + p * 11) % 97) - 48) / 7.0
                for p in range(dim)
            ],
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / name)
    build_ivf_index(emb, path, n_centroids=ncent)
    return emb, path


def test_block_gemm_row_identical_to_classic(spark, tmp_path):
    from wimbd_spark.operators.similarity import knn_join

    emb, path = _fixture(spark, tmp_path)
    for np_ in (1, 2, "all"):
        for kw in ({}, {"min_cosine": 0.3}, {"exclude_self": False}):
            g = knn_join(
                spark, path, emb, k=3, n_probe=np_, block_gemm=True, **kw
            ).collect()
            c = knn_join(
                spark, path, emb, k=3, n_probe=np_, block_gemm=False, **kw
            ).collect()
            assert sorted(map(tuple, g)) == sorted(map(tuple, c)), (
                np_,
                kw,
            )


def test_block_gemm_cosines_bitwise_equal_to_fold(spark, tmp_path):
    """The stream-level claim: per-pair cosines from the numpy block
    are the EXACT doubles the JVM fold produces (same ops, same
    order), not merely close — compared via full bit equality on
    every scored pair."""
    from wimbd_spark.operators.similarity import (
        _centroid_literal,
        _ivf_block_topk,
        _ivf_scored_stream,
    )
    from wimbd_spark.session import parquet_plan

    emb, path = _fixture(spark, tmp_path, name="bgbits")
    cents = parquet_plan(spark, f"{path}/centroids").collect()
    cent_arr = _centroid_literal(
        [{"centroid_id": r["centroid_id"], "_cent": r["v"]} for r in cents]
    )
    kw = dict(
        n_probe="all",
        id_col="vec_id",
        vec_col="embedding",
        exclude_self=False,
        min_cosine=None,
        cent_arr=cent_arr,
        n_cents=len(cents),
    )
    # k >= corpus so the block prune keeps EVERY pair
    blocked = _ivf_block_topk(
        spark, path, emb, k=100, dim=len(cents[0]["v"]), force=True, **kw
    )
    classic = _ivf_scored_stream(
        spark,
        path,
        emb,
        "all",
        "vec_id",
        "embedding",
        _cent_arr=cent_arr,
        _n_cents=len(cents),
    )
    import struct

    def bits(rows):
        return sorted(
            (
                r["query_id"],
                r["neighbor_id"],
                struct.pack("<d", r["cosine"]),
            )
            for r in rows
        )

    assert bits(blocked.collect()) == bits(classic.collect())


def test_block_gemm_dirty_inputs_route_to_classic(spark, tmp_path):
    """NULL/NaN elements and off-width vectors fail the clean probe:
    'auto' silently keeps the classic row stream (results equal the
    legacy path), True raises instead of risking numpy NULL/NaN
    semantics."""
    from wimbd_spark.operators.similarity import knn_join

    emb, path = _fixture(spark, tmp_path, name="bgdirty")
    dirty = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 7,
            F.array(
                F.lit(1.0), F.lit(None).cast("double"), *[F.lit(0.5)] * 6
            ),
        ).otherwise(F.col("embedding")),
    )
    auto = knn_join(spark, path, dirty, k=2, n_probe=2)
    plan = auto._sc._jvm.PythonSQLUtils.explainString(
        auto._jdf.queryExecution(), "simple"
    )
    assert "FlatMapCoGroupsInPandas" not in plan
    legacy = knn_join(spark, path, dirty, k=2, n_probe=2, block_gemm=False)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, legacy.collect())
    )
    with pytest.raises(ValueError, match="clean probe"):
        knn_join(spark, path, dirty, k=2, n_probe=2, block_gemm=True)
    with pytest.raises(ValueError, match="block_gemm"):
        knn_join(spark, path, emb, k=2, block_gemm="yes")


def test_block_gemm_plan_is_driver_free(spark, tmp_path):
    """The forced block path stays fully distributed: candidates come
    from a cogroup (FlatMapCoGroupsInPandas), never a collected list
    (LocalTableScan), and the exact global rank window remains."""
    from wimbd_spark.operators.similarity import build_ivf_index, knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "bgplan")
    build_ivf_index(emb, path, n_centroids=8)
    out = knn_join(spark, path, emb, k=2, n_probe=2, block_gemm=True)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "FlatMapCoGroupsInPandas" in plan
    assert "LocalTableScan" not in plan and "ExistingRDD" not in plan
    assert "Window" in plan


def test_block_gemm_delta_duplicate_counts_once(spark, tmp_path):
    """A base∪delta duplicate lands twice in one block with
    bitwise-equal uvec; the in-block id dedup keeps one so it cannot
    occupy two of the k slots — same output as a clean index."""
    from wimbd_spark.operators.similarity import knn_join

    emb, path = _fixture(spark, tmp_path, name="bgdup")
    lists = spark.read.parquet(f"{path}/lists")
    one = lists.filter(F.col("id") == 0).select("id", "uvec", "centroid")
    one.write.parquet(f"{path}/delta/run=bgdup/batch=0")
    dup = knn_join(
        spark, path, emb, k=3, n_probe="all", block_gemm=True
    ).collect()
    emb2, path2 = _fixture(spark, tmp_path, name="bgdup_clean")
    clean = knn_join(
        spark, path2, emb2, k=3, n_probe="all", block_gemm=True
    ).collect()
    assert sorted(map(tuple, dup)) == sorted(map(tuple, clean))
