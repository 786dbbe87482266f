"""url_suffix (P7), union_tables (E8), gated loaders."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.functions.text import url_suffix
from wimbd_spark.session import union_tables


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_url_suffix_longest_match(spark):
    assert one(spark, url_suffix(F.lit("https://www.bbc.co.uk/news"))) == "co.uk"
    assert one(spark, url_suffix(F.lit("http://example.com/x"))) == "com"
    assert one(spark, url_suffix(F.lit("https://foo.dev"))) == "dev"
    assert one(spark, url_suffix(F.lit("http://host.unknown-tld/x"))) is None
    assert one(spark, url_suffix(F.lit("not a url"))) is None


def test_union_tables(spark):
    spark.createDataFrame([(1, "a")], ["id", "x"]).createOrReplaceTempView(
        "corpus_en_1"
    )
    spark.createDataFrame([(2, "b"), (3, "c")], ["id", "x"]).createOrReplaceTempView(
        "corpus_en_2"
    )
    spark.createDataFrame([(9, 1.5)], ["id", "y"]).createOrReplaceTempView(
        "corpus_other"
    )
    assert union_tables(spark, "corpus_en_*").count() == 3
    # heterogeneous schemas null-fill
    all_ = union_tables(spark, "corpus_*")
    assert all_.count() == 4
    assert set(all_.columns) == {"id", "x", "y"}
    with pytest.raises(ValueError):
        union_tables(spark, "zzz_*")


def test_gated_loaders_raise_clearly(spark, tmp_path):
    from wimbd_spark.corpus import load_hf_dataset, load_tfrecords

    with pytest.raises(NotImplementedError):
        load_hf_dataset(spark, "c4")  # hub name without `datasets`
    with pytest.raises(NotImplementedError):
        # connector jar not on this classpath
        load_tfrecords(spark, [str(tmp_path)], use_connector=True)


def test_ftfy_fix_repairs_mojibake(spark):
    from wimbd_spark.operators.models import ftfy_fix

    rows = [
        ("ok text", "ok text"),            # ASCII untouched
        ("café déjà", "café déjà"),        # clean accents untouched
        ("cafÃ©", "café"),                 # utf-8 read as latin-1
        ("donâ€™t", "don’t"),              # cp1252 smart quote
        ("ÃƒÂ©", "é"),                     # double-encoded, two passes
        (None, None),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], ["text"])
    got = [r["t"] for r in df.select(ftfy_fix(F.col("text")).alias("t")).collect()]
    assert got == [b for _, b in rows]


def test_fix_mojibake_pure():
    from wimbd_spark.operators.models import fix_mojibake

    assert fix_mojibake("Ã©") == "é"
    assert fix_mojibake("â‚¬100") == "€100"
    # mixed genuine unicode is left alone (outside the cp1252 subset)
    assert fix_mojibake("Ã© 日本") == "Ã© 日本"
    assert fix_mojibake("") == ""
