"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schema contract, typed
metadata struct, partition-preserving batch iteration, bounded batch sizes.
The codec layer has two real paths and one stub:

- ``png`` / ``jpeg`` / ``gif``: REAL stdlib-only container parsing
  (:func:`png_dims` / :func:`jpeg_dims` / :func:`gif_dims` — PNG IHDR,
  JPEG SOF marker scan, GIF logical-screen descriptor). No PIL needed for
  dimension metadata; pixel decode (which WOULD need PIL/ffmpeg, absent in
  this container) still raises ``NotImplementedError`` further down the
  pipeline where pixels would be touched.
- ``tsdl-fake``: deterministic fake header layout for oracle-gated tests.
- anything else (audio/video codecs): explicit ``NotImplementedError``.

Swapping in PIL/ffmpeg later changes only ``_decode_payload``.

Scale notes: ``mapInPandas`` streams Arrow record batches through Python
without materializing a partition; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds peak memory per batch, so executor memory sizing
is independent of blob sizes × partition row counts. Blobs stay opaque bytes
end-to-end (no JVM<->Python string copies), and feature extraction emits
fixed-width vectors so downstream similarity ops (:mod:`.similarity`) apply
unchanged.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

# Fake header layout for the deterministic stub codec: magic 'TSDL' +
# uint16 width + uint16 height + uint16 frames, big-endian.
_MAGIC = b"TSDL"
_HEADER = ">HHH"


def pack_fake_payload(width: int, height: int, frames: int, body: bytes = b"") -> bytes:
    """Test helper: build a payload in the stub codec's header layout."""
    return _MAGIC + struct.pack(_HEADER, width, height, frames) + body


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from the PNG IHDR chunk (PNG spec §11.2.2): the 8-byte
    signature is followed by the IHDR chunk whose data starts at offset 16
    with two big-endian uint32s. Pure stdlib — no pixel decode."""
    if payload[:8] != _PNG_SIG or payload[12:16] != b"IHDR" or len(payload) < 24:
        return (0, 0)
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h)


def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from the first JPEG SOF frame header (ITU T.81 §B.2.2):
    walk the marker segments from SOI until a start-of-frame marker
    (0xC0-0xCF excluding DHT 0xC4, JPG 0xC8, DAC 0xCC); height/width are
    the two big-endian uint16s after the segment length and precision
    byte."""
    if payload[:2] != b"\xff\xd8":
        return (0, 0)
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # spec-legal fill byte before the real marker
            i += 1
            continue
        if marker in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF follows
            return (0, 0)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return (w, h)
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return (0, 0)


def gif_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from the GIF logical-screen descriptor (GIF89a spec
    §18): two little-endian uint16s right after the 6-byte version block."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 10:
        return (0, 0)
    w, h = struct.unpack("<HH", payload[6:10])
    return (w, h)


def _decode_payload(payload: bytes, codec: str) -> tuple[int, int, int]:
    """Container-header decode. PNG/JPEG/GIF dimension parsing is REAL
    (stdlib struct over the container layout — see png_dims/jpeg_dims/
    gif_dims); 'tsdl-fake' is the deterministic test codec; audio/video
    codecs (which need ffmpeg/soundfile, absent here) are explicitly not
    implemented. Still images report n_frames=1."""
    if codec == "tsdl-fake":
        if payload[:4] != _MAGIC:
            return (0, 0, 0)
        w, h, f = struct.unpack(_HEADER, payload[4:10])
        return (w, h, f)
    if codec == "png":
        w, h = png_dims(bytes(payload))
        return (w, h, 1 if w else 0)
    if codec in ("jpeg", "jpg"):
        w, h = jpeg_dims(bytes(payload))
        return (w, h, 1 if w else 0)
    if codec == "gif":
        w, h = gif_dims(bytes(payload))
        return (w, h, 1 if w else 0)
    raise NotImplementedError(
        f"codec {codec!r}: pixel/AV decoders (PIL/ffmpeg/soundfile) are stubbed out"
    )


def decode_media(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode payload headers into typed columns via mapInPandas (Arrow
    record-batch streaming; one output row per input row)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_payload(p, c)
                for p, c in zip(pdf["payload"], pdf["meta"].map(lambda m: m["codec"]))
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic fake feature extraction: byte-histogram folded to a
    FEATURE_DIM vector — the real embedding model slots in here. Output
    shape matches the ``embeddings`` table so similarity ops compose."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["payload"]:
                hist = [0.0] * FEATURE_DIM
                for b in p:
                    hist[b % FEATURE_DIM] += 1.0
                total = sum(hist) or 1.0
                rows.append([v / total for v in hist])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": rows})

    return df.mapInPandas(feats, schema=FEATURES_SCHEMA)


def _resize_dims(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving fit in pure integer arithmetic (floor division),
    so the resize plan is reproducible in the SQL oracle bit-for-bit."""
    if (w <= max_w and h <= max_h) or w == 0 or h == 0:
        return w, h
    if w * max_h <= h * max_w:  # height is the tighter axis
        return (w * max_h) // h, max_h
    return max_w, (h * max_w) // w


def resize_media(df: DataFrame, max_width: int = 640, max_height: int = 480) -> DataFrame:
    """Stub resize: re-pack the payload header with aspect-fit dimensions
    (body bytes pass through untouched — a real codec would transcode here;
    only ``_resize_dims`` + the header rewrite are the stub). Output is the
    same media schema, so resizes chain with decode/feature/frame ops."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p, c in zip(pdf["payload"], pdf["meta"].map(lambda m: m["codec"])):
                if c != "tsdl-fake":
                    # real-format resize is a pixel transcode -> needs PIL
                    raise NotImplementedError(
                        f"resize of codec {c!r} requires a pixel transcoder"
                    )
                w, h, f = _decode_payload(p, c)
                nw, nh = _resize_dims(w, h, max_width, max_height)
                payloads.append(_MAGIC + struct.pack(_HEADER, nw, nh, f) + bytes(p[10:]))
            out = pdf.copy()
            out["payload"] = payloads
            yield out

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling (1 row per kept frame) — demonstrates the
    row-expanding mapInPandas shape; frame payloads are stub slices."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx = [], []
            for mid, p, c in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"].map(lambda m: m["codec"])
            ):
                _, _, frames = _decode_payload(p, c)
                for i in range(0, frames, every_n):
                    out_ids.append(mid)
                    out_idx.append(i)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_index": pd.Series(out_idx, dtype="int32"),
                }
            )

    return df.mapInPandas(sample, schema=schema)
