"""standardize_corpus (S8 prep) tests."""

from wimbd_spark.corpus import standardize_corpus


def test_standardize_corpus(spark):
    df = spark.createDataFrame(
        [("c1", "hello", "py", 42), ("c2", "world", "rs", 7)],
        ["content_id", "body", "language", "stars"],
    )
    out = standardize_corpus(
        df,
        text_field="body",
        id_field="content_id",
        lang_field="language",
        source="the-stack",
    )
    assert out.columns == ["id", "text", "lang", "source", "metadata"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["c1"]["text"] == "hello"
    assert rows["c1"]["lang"] == "py"
    assert rows["c1"]["source"] == "the-stack"
    assert rows["c1"]["metadata"] == {"stars": "42"}


def test_standardize_generates_ids(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["text"])
    out = standardize_corpus(df).collect()
    assert len({r["id"] for r in out}) == 2
