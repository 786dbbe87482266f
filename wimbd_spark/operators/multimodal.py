"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``deterministic_fake=True`` produces a stable fake decode
(byte-derived features) so the Spark-side plumbing — schema,
partitioning, batch shapes, UDF signatures — is real and testable;
``deterministic_fake=False`` raises NotImplementedError where a real
PIL/ffmpeg call would go.

Scale notes: binary payloads make rows wide — keep
`spark.sql.files.maxPartitionBytes` small for such tables, project the
binary column as late as possible, and never groupBy/shuffle raw bytes
(aggregate extracted features instead).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),      # png|jpeg|wav|mp4|…
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_fake_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media-shaped table from a text corpus: payload =
    UTF-8 bytes of text (a deterministic stand-in for image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias(
            "payload"
        ),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram-ish
    features. Stable across executors/runs (no RNG, no libs)."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] += byte
    n = max(len(payload), 1)
    return [a / n for a in acc]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    batch_size_hint: int = 1024,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches).

    Real pipeline shape: iterator-of-batches so a model/codec is
    initialized once per task, not per row. Output: FEATURE_SCHEMA.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg — not in this "
                "container; use deterministic_fake=True for plumbing tests"
            )
        # (real impl would lazily open the codec/model HERE, once)
        for pdf in batches:
            feats = [
                _fake_decode_features(p, dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Video → sampled frames (doc_id, frame_idx, frame binary).

    Stub: fake frames are byte slices; a real impl swaps the slicer
    for an ffmpeg seek+decode while keeping the identical dataflow.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not deterministic_fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                step = max(every_ms, 1)
                for i, off in enumerate(range(0, max(len(payload), 1), step)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + step]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("doc_id", "payload").mapInPandas(run, out_schema)


def bytes_meta(media: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata over payloads (no Python): size + first
    byte (hex) — the 'magic sniff' step before any decode fan-out."""
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.substring(F.hex("payload"), 1, 2)).alias("first_byte_hex"),
    )
