"""Multimodal plumbing tests: binary columns, mapInPandas batch shape,
stubbed decode."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.multimodal import (
    attach_fake_payload,
    bytes_meta,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "xyz"), (3, None)], ["doc_id", "text"]
    )
    return attach_fake_payload(df)


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert "media_type" in media.select("meta.*").columns


def test_bytes_meta(media):
    rows = {r["doc_id"]: r for r in bytes_meta(media).collect()}
    assert rows[1]["n_bytes"] == 11
    assert rows[1]["first_byte_hex"] == "68"  # 'h'
    assert rows[3]["n_bytes"] == 0


def test_extract_features_deterministic(media):
    a = {r["doc_id"]: r["features"] for r in extract_features(media).collect()}
    b = {r["doc_id"]: r["features"] for r in extract_features(media).collect()}
    assert a == b
    assert len(a[1]) == 8
    assert a[1] != a[2]


def test_extract_features_real_path_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample(media):
    rows = frame_sample(media, every_ms=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # "hello world" = 11 bytes, step 4 → frames at 0,4,8 → 3 frames
    assert len(by_doc[1]) == 3
    assert bytes(by_doc[1][0]["frame"]) == b"hell"
    # reassembling frames gives back the payload
    joined = b"".join(bytes(r["frame"]) for r in sorted(by_doc[1], key=lambda r: r["frame_idx"]))
    assert joined == b"hello world"
