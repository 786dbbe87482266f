"""Real (network-free) S6/S7 ingest paths: local HF dataset dirs and
raw TFRecord files — end-to-end through standardize_corpus."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wimbd_spark.corpus import load_hf_dataset


@pytest.fixture
def table():
    return pa.table(
        {
            "content": ["alpha beta", "gamma delta", "epsilon"],
            "doc_id": ["a1", "b2", "c3"],
            "stars": [3, 1, 4],
        }
    )


def test_hf_parquet_dir(spark, tmp_path, table):
    """Hub-snapshot layout: data/<split>-NNNNN-of-NNNNN.parquet."""
    d = tmp_path / "myset" / "data"
    d.mkdir(parents=True)
    pq.write_table(table.slice(0, 2), d / "train-00000-of-00002.parquet")
    pq.write_table(table.slice(2), d / "train-00001-of-00002.parquet")
    pq.write_table(table.slice(0, 1), d / "test-00000-of-00001.parquet")

    df = load_hf_dataset(
        spark, str(tmp_path / "myset"), text_field="content", id_field="doc_id"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"a1", "b2", "c3"}
    assert rows["a1"]["text"] == "alpha beta"
    assert rows["c3"]["source"] == "myset"
    assert rows["b2"]["metadata"]["stars"] == "1"
    # split selection is real: test split has 1 row
    assert load_hf_dataset(
        spark, str(tmp_path / "myset"), split="test", text_field="content"
    ).count() == 1


def test_hf_save_to_disk_arrow_dir(spark, tmp_path, table):
    """save_to_disk layout: <split>/data-NNNNN-of-NNNNN.arrow IPC shards,
    read distributed via mapInPandas (no `datasets` package)."""
    d = tmp_path / "arrset" / "train"
    d.mkdir(parents=True)
    for i, sl in enumerate((table.slice(0, 2), table.slice(2))):
        with pa.ipc.new_stream(
            str(d / f"data-0000{i}-of-00002.arrow"), table.schema
        ) as w:
            for batch in sl.to_batches(max_chunksize=1):
                w.write_batch(batch)

    df = load_hf_dataset(
        spark, str(tmp_path / "arrset"), text_field="content", id_field="doc_id"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"a1", "b2", "c3"}
    assert rows["b2"]["text"] == "gamma delta"
    assert rows["a1"]["metadata"]["stars"] == "3"


def test_hf_missing_split_raises(spark, tmp_path, table):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        load_hf_dataset(spark, str(d), split="train")


def test_hf_toplevel_parquet_only_serves_default_split(spark, tmp_path, table):
    """A top-level-parquet layout carries no split labels — it must
    satisfy only the default train split. Requesting validation on it
    raises instead of silently returning train files (decontamination
    safety)."""
    d = tmp_path / "flat"
    d.mkdir()
    pq.write_table(table, d / "part-0.parquet")
    assert load_hf_dataset(spark, str(d), text_field="content").count() == 3
    with pytest.raises(FileNotFoundError):
        load_hf_dataset(
            spark, str(d), split="validation", text_field="content"
        )


# ---- S7: TFRecord ----

from wimbd_spark.corpus import load_tfrecords, standardize_corpus
from wimbd_spark.sources.tfrecord import (
    decode_example,
    infer_features,
    iter_tfrecord_payloads,
    write_tfrecord,
)


@pytest.fixture
def tfrec_dir(tmp_path):
    d = tmp_path / "tfr"
    d.mkdir()
    write_tfrecord(
        str(d / "part-0.tfrecord"),
        [
            {"text": "hello world", "doc_id": "x1", "n": 7, "score": 0.5},
            {"text": "negative int", "doc_id": "x2", "n": -3, "score": 1.25},
        ],
    )
    write_tfrecord(
        str(d / "part-1.tfrecord"),
        [{"text": "second shard", "doc_id": "x3", "n": 0, "score": -2.0}],
    )
    return d


def test_tfrecord_roundtrip(spark, tfrec_dir):
    df = load_tfrecords(spark, [str(tfrec_dir)])
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {"x1", "x2", "x3"}
    assert rows["x1"]["text"] == "hello world"
    assert rows["x2"]["n"] == -3  # int64 sign-extension
    assert abs(rows["x3"]["score"] + 2.0) < 1e-6
    # inferred spark types
    assert dict(df.dtypes)["n"] == "bigint"
    assert dict(df.dtypes)["score"] == "double"


def test_tfrecord_explicit_spec_prunes_and_nulls(spark, tfrec_dir):
    df = load_tfrecords(
        spark,
        [str(tfrec_dir / "part-*.tfrecord")],
        features={"text": "string", "missing": "bigint"},
    )
    assert df.columns == ["text", "missing"]
    assert all(r["missing"] is None for r in df.collect())


def test_tfrecord_list_features(spark, tmp_path):
    p = str(tmp_path / "lists.tfrecord")
    write_tfrecord(p, [{"toks": ["a", "b", "c"], "ids": [1, 2, 3]}])
    assert infer_features(p) == {
        "toks": "array<string>",
        "ids": "array<bigint>",
    }
    r = load_tfrecords(spark, [p]).collect()[0]
    assert r["toks"] == ["a", "b", "c"] and r["ids"] == [1, 2, 3]


def test_tfrecord_chunked_yield_same_rows(spark, tmp_path):
    """Bounded-chunk decode (memory guard) must not change results:
    5 records through chunk_records=2 → 3 yielded chunks, same rows."""
    from wimbd_spark.sources.tfrecord import read_tfrecords

    p = str(tmp_path / "chunks.tfrecord")
    write_tfrecord(
        p, [{"text": f"doc {i}", "doc_id": f"d{i}"} for i in range(5)]
    )
    rows = {
        r["doc_id"]: r["text"]
        for r in read_tfrecords(spark, [p], chunk_records=2).collect()
    }
    assert rows == {f"d{i}": f"doc {i}" for i in range(5)}


def test_tfrecord_crc_detects_corruption(spark, tmp_path):
    p = str(tmp_path / "c.tfrecord")
    write_tfrecord(p, [{"text": "payload to corrupt"}])
    list(iter_tfrecord_payloads(p, verify_crc=True))  # clean file passes
    raw = bytearray(open(p, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(iter_tfrecord_payloads(p, verify_crc=True))


def test_tfrecord_to_canonical_corpus(spark, tfrec_dir):
    """End-to-end S7: TFRecord shards → standardize_corpus → canonical
    document schema (the reference's mc4 prep result)."""
    df = standardize_corpus(
        load_tfrecords(spark, [str(tfrec_dir)]),
        text_field="text",
        id_field="doc_id",
        source="mc4",
    )
    assert df.columns == ["id", "text", "lang", "source", "metadata"]
    r = {x["id"]: x for x in df.collect()}
    assert r["x2"]["metadata"]["n"] == "-3"
