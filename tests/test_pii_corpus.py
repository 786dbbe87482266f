"""PII extraction, taxonomy counts, corpus IO tests."""

import os

import pytest
from pyspark.sql import functions as F

from wimbd_spark.corpus import (
    expand_dirs,
    load_jsonl,
    split_files,
    split_train_valid_test,
    to_parquet_corpus,
)
from wimbd_spark.operators.pii import (
    demographic_cooccurrence,
    extract_pii,
    pii_counts,
    pii_doc_filter,
    sentence_split,
    taxonomy_counts,
)


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "contact me at john.doe@example.com or call 555-123-4567"),
        (2, "server at 192.168.1.1 responded"),
        (3, "ISBN 555-123-4567 is a book number, not a phone"),
        (4, "DOI 10.1.1.1 is a doi not an ip"),
        (5, "." * 30 + " garbage doc with dots"),
        (6, None),
        (7, "nothing sensitive here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_extraction_with_context_rules(pii_docs):
    rows = extract_pii(pii_docs).collect()
    found = {(r["doc_id"], r["kind"]) for r in rows}
    assert (1, "email") in found
    assert (1, "phone") in found
    assert (2, "ip") in found
    assert (3, "phone") not in found  # ISBN context rejects
    assert (4, "ip") not in found     # DOI context rejects
    assert all(r["doc_id"] != 5 for r in rows)  # garbage doc filtered


def test_pii_counts(pii_docs):
    got = {r["kind"]: r["count"] for r in pii_counts(pii_docs).collect()}
    assert got == {"email": 1, "phone": 1, "ip": 1}


def test_pii_doc_filter(spark):
    # reference garbage rules (wimbd/pii/map_count.py:129-142): the
    # literals are 45 dots / 99 bangs / 76 commas / 121 semicolons etc.;
    # shorter runs are NOT garbage.
    df = spark.createDataFrame(
        [
            (1, "ok"),
            (2, "." * 25),          # kept: short dot run
            (3, "%" * 1500),        # rejected: count('%') > 1000
            (4, "  "),              # rejected: blank
            (5, "." * 45),          # rejected: 45-dot literal
            (6, "!" * 99 + " hi"),  # rejected: 99-bang literal
            (7, "x " + "# # # # # # #"),  # rejected
            (8, "what??????? " * 1),      # rejected: ???????
            (9, ("..........." + " x ") * 51),  # rejected: >50 runs of 11 dots
            (10, ":)" * 52),        # rejected: smiley run
            (11, ";" * 121),        # rejected
            (12, "," * 76),         # rejected
            (13, ("/ / / / / x ") * 51),  # rejected: >50 slash runs
        ],
        ["doc_id", "text"],
    )
    kept = [
        r["doc_id"]
        for r in df.filter(pii_doc_filter(F.col("text"))).collect()
    ]
    assert kept == [1, 2]


def test_pii_phone_url_context_rejects(spark):
    # reference rule (wimbd/pii/map_count.py:44-54): a phone whose
    # 50-chars-each-side window contains a URL is rejected; ip keeps
    # the '#' rejection; window extends past 25 chars before the match.
    df = spark.createDataFrame(
        [
            (1, "visit https://spam.example.com now, call 555-123-4567"),
            (2, "visit www.spam.example.com now, call 555-123-4567"),
            (3, "plain phone 555-123-4567 no url"),
            (4, "ticket #42 mentioned ip 10.1.2.3 today"),
            (5, "ISBN 0000 is " + "x" * 30 + " far 555-123-4567"),  # isbn 43 chars before → in 50-window
            (6, "ISBN 0000 is " + "x" * 60 + " far 555-123-4567"),  # isbn beyond 50 → kept
        ],
        ["doc_id", "text"],
    )
    found = {(r["doc_id"], r["kind"]) for r in extract_pii(df).collect()}
    assert (1, "phone") not in found
    assert (2, "phone") not in found
    assert (3, "phone") in found
    assert (4, "ip") not in found
    assert (5, "phone") not in found
    assert (6, "phone") in found


def test_taxonomy_counts(spark):
    wordlist = spark.createDataFrame(
        [("bad", "offensive"), ("awful", "offensive"), ("kind", "harmless")],
        ["word", "categorization"],
    )
    docs = spark.createDataFrame(
        [(1, "a bad and awful day, but bad people can be kind"),
         (2, "badly is not the word bad alone")],
        ["doc_id", "text"],
    )
    got = {
        r["categorization"]: r["count"]
        for r in taxonomy_counts(docs, wordlist).collect()
    }
    # \b-bounded: "badly" does not count, "bad" thrice, "awful" once
    assert got == {"offensive": 4, "harmless": 1}


def test_sentence_split(spark):
    r = (
        spark.range(1)
        .select(
            sentence_split(F.lit("One two. Three four! Five? end")).alias("s")
        )
        .collect()[0]["s"]
    )
    assert r == ["One two.", "Three four!", "Five?", "end"]


def test_demographic_cooccurrence(spark):
    docs = spark.createDataFrame(
        [(1, "He went home. She stayed here. He and she talked.")],
        ["doc_id", "text"],
    )
    got = {
        r["term"]: r["count"]
        for r in demographic_cooccurrence(docs, ["he", "she", "muslim"]).collect()
    }
    assert got == {"he": 2, "she": 2, "muslim": 0}


def test_load_jsonl_roundtrip(spark, tmp_path):
    import gzip, json

    shard = tmp_path / "part-00.jsonl.gz"
    with gzip.open(shard, "wt") as f:
        for i in range(5):
            f.write(json.dumps({"id": str(i), "text": f"doc {i}"}) + "\n")
    df = load_jsonl(spark, [str(tmp_path)])
    rows = df.orderBy("id").collect()
    assert len(rows) == 5
    assert rows[0]["text"] == "doc 0"
    assert rows[0]["_file"].endswith("part-00.jsonl.gz")
    # per-file line limit (S4)
    assert load_jsonl(spark, [str(tmp_path)], line_limit=2).count() == 2


def test_expand_dirs_errors_on_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        expand_dirs([str(tmp_path)])


def test_split_train_valid_test(documents):
    out = split_train_valid_test(documents)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts.get("train", 0) >= 0.99 * documents.count()


def test_split_files(documents):
    assert split_files(documents, 7).rdd.getNumPartitions() == 7


def test_to_parquet_corpus_roundtrip(documents, tmp_path):
    p = str(tmp_path / "corpus")
    to_parquet_corpus(documents, p, partition_by=["lang"])
    back = documents.sparkSession.read.parquet(p)
    assert back.count() == documents.count()
    assert os.path.isdir(os.path.join(p, "lang=en"))


def test_redact_pii(spark):
    from wimbd_spark.operators.pii import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at bob@example.com today"),
            (1, "call 555-123-4567 or visit 10.0.0.1 now"),
            (2, "nothing sensitive"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    assert out[0] == "mail me at [EMAIL] today"
    assert out[1] == "call [PHONE] or visit [IP] now"
    assert out[2] == "nothing sensitive"
    assert out[3] is None
    # kind selection + custom replacement
    only_email = {
        r["doc_id"]: r["text"]
        for r in redact_pii(
            df, kinds=("email",), replacement="<{KIND}>"
        ).collect()
    }
    assert only_email[0] == "mail me at <EMAIL> today"
    assert only_email[1] == "call 555-123-4567 or visit 10.0.0.1 now"
