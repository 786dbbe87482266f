"""cosine_pairs_lsh block-matrix verifier: parity with the classic
per-candidate join (rows AND cosine doubles bit-identical), the
clean-probe fallback, and the force contract."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.similarity import cosine_pairs_lsh


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )


@pytest.mark.parametrize(
    "nbits,multiprobe", [(6, True), (6, False), (4, True)]
)
def test_block_matches_classic(spark, emb, nbits, multiprobe):
    blk = cosine_pairs_lsh(
        emb, threshold=0.45, nbits=nbits, dim=64,
        multiprobe=multiprobe, block_gemm=True,
    )
    cls = cosine_pairs_lsh(
        emb, threshold=0.45, nbits=nbits, dim=64,
        multiprobe=multiprobe, block_gemm=False,
    )
    # exceptAll compares the cosine doubles bitwise, both directions
    assert blk.exceptAll(cls).count() == 0
    assert cls.exceptAll(blk).count() == 0
    assert blk.count() == cls.count()


def _dirty(emb):
    return emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 5,
            F.array(*[F.lit(float("nan"))] * 64),
        ).otherwise(F.col("embedding")),
    )


def test_dirty_vectors_fall_back_to_classic(spark, emb):
    auto = cosine_pairs_lsh(
        _dirty(emb), threshold=0.45, nbits=6, dim=64, block_gemm="auto"
    )
    cls = cosine_pairs_lsh(
        _dirty(emb), threshold=0.45, nbits=6, dim=64, block_gemm=False
    )
    assert auto.exceptAll(cls).count() == 0
    assert cls.exceptAll(auto).count() == 0


def test_force_block_raises_on_dirty(spark, emb):
    with pytest.raises(ValueError, match="clean probe"):
        cosine_pairs_lsh(
            _dirty(emb), threshold=0.45, nbits=6, dim=64,
            block_gemm=True,
        ).count()


def test_bad_block_gemm_value(spark, emb):
    with pytest.raises(ValueError, match="block_gemm"):
        cosine_pairs_lsh(emb, block_gemm="yes")


def test_block_matches_classic_string_ids(spark, emb):
    """id ordering must agree between the JVM (UTF8String byte order)
    and the numpy object-array compare (codepoint order) — identical
    for UTF-8, pinned here so a future id-type change can't silently
    diverge the block path."""
    s = emb.withColumn(
        "vec_id",
        F.concat(F.lit("v"), F.col("vec_id").cast("string")),
    )
    blk = cosine_pairs_lsh(
        s, threshold=0.45, nbits=6, dim=64, block_gemm=True
    )
    cls = cosine_pairs_lsh(
        s, threshold=0.45, nbits=6, dim=64, block_gemm=False
    )
    assert blk.exceptAll(cls).count() == 0
    assert cls.exceptAll(blk).count() == 0
