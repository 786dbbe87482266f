"""Bucketed-table materialization: repeated joins keyed on the bucket
column run without a shuffle on either side."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.corpus import to_bucketed_table
from wimbd_spark.plans import shuffle_count


def test_bucketed_join_no_shuffle(spark, documents, tmp_path):
    docs = documents.select("doc_id", "text", "lang")
    to_bucketed_table(
        docs, "docs_a", "doc_id", n_buckets=8, path=str(tmp_path / "a")
    )
    to_bucketed_table(
        documents.select("doc_id", "source"),
        "docs_b",
        "doc_id",
        n_buckets=8,
        path=str(tmp_path / "b"),
    )
    a, b = spark.table("docs_a"), spark.table("docs_b")
    joined = a.join(b, "doc_id")
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert shuffle_count(joined) == 0
        assert joined.count() == docs.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS docs_a")
        spark.sql("DROP TABLE IF EXISTS docs_b")
