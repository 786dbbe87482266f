"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over mapInPandas.

Decode status (no PIL/ffmpeg in this container, so everything here is
stdlib/numpy):
- header sniffing (`sniff_media_meta`) is REAL for PNG/JPEG/GIF/BMP/WAV
  — magic bytes, dimensions, and audio duration parsed from the
  container headers;
- pixel/sample decode (`deterministic_fake=False`) is REAL for
  non-interlaced 8-bit PNG (zlib inflate + scanline unfilter) and PCM
  WAV (numpy frombuffer) — features are luminance / RMS-amplitude
  bucket profiles;
- JPEG entropy decode and video demux still raise NotImplementedError
  (genuinely need libcodec); ``deterministic_fake=True`` keeps a
  stable byte-derived fake so plumbing stays testable for those.

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


def parse_media_header(b: bytes | None):
    """(media_type, format, width, height, duration_ms) from container
    magic + header fields, or None if unrecognized. Pure stdlib."""
    import struct as _s

    if not b or len(b) < 12:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = _s.unpack(">II", b[16:24])
        return ("image", "png", w, h, None)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to SOFn
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = _s.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _s.unpack(">HH", b[i + 5 : i + 9])
                return ("image", "jpeg", w, h, None)
            i += 2 + seglen
        return ("image", "jpeg", None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _s.unpack("<HH", b[6:10])
        return ("image", "gif", w, h, None)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = _s.unpack("<ii", b[18:26])
        return ("image", "bmp", w, abs(h), None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, rate, byte_rate, data_size = 12, None, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = _s.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                rate = _s.unpack("<I", b[i + 12 : i + 16])[0]
                byte_rate = _s.unpack("<I", b[i + 16 : i + 20])[0]
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)
        dur = (
            int(data_size * 1000 / byte_rate)
            if byte_rate and data_size is not None
            else None
        )
        return ("audio", "wav", None, None, dur)
    return None


def sniff_media_meta(media: DataFrame) -> DataFrame:
    """REAL metadata extraction from payload headers via mapInPandas →
    (doc_id, media_type, format, width, height, duration_ms, n_bytes).
    The per-format parsers read fixed header offsets — cost is O(header)
    per row regardless of payload size."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("media_type", StringType()),
            StructField("format", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("duration_ms", LongType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in schema.fieldNames()}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_media_header(payload) or (
                    None,
                    None,
                    None,
                    None,
                    None,
                )
                rows["doc_id"].append(doc_id)
                for k, v in zip(
                    ("media_type", "format", "width", "height", "duration_ms"),
                    parsed,
                ):
                    rows[k].append(v)
                rows["n_bytes"].append(len(payload) if payload else 0)
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def decode_png(b: bytes):
    """Non-interlaced 8-bit PNG → (width, height, channels, flat pixel
    bytearray). Stdlib-only: zlib inflate + per-scanline unfilter
    (filters 0-4 incl. Paeth). Raises on palette/16-bit/interlaced."""
    import struct as _s
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w = h = None
    channels = {0: 1, 2: 3, 4: 2, 6: 4}
    nch = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(b):
        (ln,) = _s.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = _s.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in channels or interlace:
                raise NotImplementedError(
                    "decode_png handles non-interlaced 8-bit gray/RGB/GA/RGBA"
                )
            nch = channels[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    out = bytearray(h * stride)
    prev = bytearray(stride)

    def paeth(a, bb, c):
        p = a + bb - c
        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return bb if pb <= pc else c

    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                c = prev[x - nch] if x >= nch else 0
                line[x] = (line[x] + paeth(a, prev[x], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, nch, out


def decode_wav(b: bytes):
    """PCM WAV → (sample_rate, numpy int array of samples, channels).
    Handles 8/16-bit PCM; raises on compressed codecs."""
    import struct as _s

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i, fmt = 12, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = _s.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            codec, nch, rate = _s.unpack("<HHI", b[i + 8 : i + 16])
            bits = _s.unpack("<H", b[i + 22 : i + 24])[0]
            fmt = (codec, nch, rate, bits)
        elif cid == b"data" and fmt:
            codec, nch, rate, bits = fmt
            if codec != 1 or bits not in (8, 16):
                raise NotImplementedError("decode_wav handles 8/16-bit PCM")
            raw = b[i + 8 : i + 8 + size]
            dt = np.uint8 if bits == 8 else np.dtype("<i2")
            samples = np.frombuffer(raw, dtype=dt)
            if bits == 8:
                samples = samples.astype(np.int16) - 128
            return rate, samples, nch
        i += 8 + size + (size & 1)
    raise ValueError("WAV data chunk not found")


def _real_decode_features(payload: bytes, dim: int) -> list[float]:
    """Real decode → fixed-dim profile: PNG → mean luminance per
    row-bucket (0-1); WAV → RMS amplitude per time-bucket (0-1)."""
    import numpy as np

    parsed = parse_media_header(payload)
    if parsed is None:
        raise NotImplementedError("unrecognized media container")
    kind = parsed[1]
    if kind == "png":
        w, h, nch, pix = decode_png(payload)
        arr = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(h, w * nch)
        lum = arr.reshape(h * w, nch)[:, : min(nch, 3)].mean(axis=1)
        buckets = np.array_split(lum, dim)
        return [float(x.mean() / 255.0) if len(x) else 0.0 for x in buckets]
    if kind == "wav":
        _rate, samples, _nch = decode_wav(payload)
        if samples.size == 0:
            return [0.0] * dim
        buckets = np.array_split(samples.astype(np.float64), dim)
        return [
            float(np.sqrt((x**2).mean()) / 32768.0) if len(x) else 0.0
            for x in buckets
        ]
    raise NotImplementedError(
        f"real decode for {kind!r} requires PIL/ffmpeg"
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
        decode = (
            _fake_decode_features if deterministic_fake else _real_decode_features
        )
        # (a model-backed impl would lazily open the codec/model HERE)
        for pdf in batches:
            feats = [decode(p, dim) for p in pdf["payload"]]
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
