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
