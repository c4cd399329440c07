"""Baseline JPEG codec gates (operators/jpeg.py): exactness bounds for
the DCT round-trip, the hand-derived Annex-K-table stream (independent of
our encoder), sampling/restart-marker coverage, honest raises, and the
Spark pixel-pipeline integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from time_series_and_data_lakes_spark.operators.jpeg import (
    STD_LUMA_QT,
    jpeg_decode,
    jpeg_encode,
)

ONES = np.ones((8, 8), np.int32)


def test_flat_image_roundtrips_exactly():
    arr = np.full((24, 40, 3), 77, np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(arr, ONES, ONES)), arr)


def test_ones_tables_bound_dct_rounding_error():
    # With unit quantization the only loss is DCT/IDCT + color-transform
    # float rounding: bounded by a couple of counts even on pure noise.
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    back = jpeg_decode(jpeg_encode(arr, ONES, ONES))
    assert int(np.abs(back.astype(int) - arr.astype(int)).max()) <= 3


def test_block_constant_image_is_exact():
    # images constant per 8x8 block survive even the chroma transform:
    # every coefficient is DC-only and integral after quantization by 1
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (6, 8, 3)).astype(np.float64)
    arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)[:43, :61]
    assert np.array_equal(jpeg_decode(jpeg_encode(arr, ONES, ONES)), arr)


def test_420_subsampling_and_restart_markers():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    gray = np.stack([g, g, g], axis=2)  # chroma flat at 128
    back = jpeg_decode(jpeg_encode(gray, ONES, ONES, subsample=True))
    assert int(np.abs(back.astype(int) - gray.astype(int)).max()) <= 1

    arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    back = jpeg_decode(jpeg_encode(arr, ONES, ONES, restart_interval=3))
    assert int(np.abs(back.astype(int) - arr.astype(int)).max()) <= 3


def test_standard_tables_are_lossy_but_sane():
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (4, 6, 3)).astype(np.float64)
    arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    back = jpeg_decode(jpeg_encode(arr))  # Annex K example tables
    # flat blocks: error is DC quantization only — small
    assert int(np.abs(back.astype(int) - arr.astype(int)).max()) <= 8


# ITU T.81 Annex K.3 luminance Huffman tables (published standard data)
_K_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_VALS = list(range(12))
_K_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_decodes_hand_derived_annex_k_stream():
    """Independent-of-our-encoder gate: a single-component 8x8 JPEG using
    the STANDARD'S OWN Annex K.3 luminance Huffman tables, with the scan
    bits derived by hand from the spec. Flat value 200, qt=16: DC coeff
    = round(8*(200-128)/16) = 36 → DC size-6 code '1110' + magnitude
    '100100', then EOB '1010'; padded with 1s → bytes E9 2B. A correct
    canonical-table build and bit walk must reconstruct 200 exactly."""
    assert sum(_K_AC_BITS) == len(_K_AC_VALS) == 162
    qt = bytes([0]) + bytes([16] * 64)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes([0xE9, 0x2B])
        + b"\xff\xd9"
    )
    out = jpeg_decode(jpg)
    assert out.shape == (8, 8, 3)
    assert (out == 200).all()


def test_honest_raises():
    # progressive (SOF2)
    sof2 = (
        b"\xff\xd8"
        + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(sof2)
    # arithmetic coding (SOF9)
    sof9 = (
        b"\xff\xd8"
        + _seg(0xC9, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg_decode(sof9)
    # header-only stream (the dims fixture shape): corrupt data, not a stub
    with pytest.raises(ValueError, match="without SOS"):
        jpeg_decode(b"\xff\xd8" + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])) + b"\xff\xd9")
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"NOPE")


def test_jpeg_resize_pipeline_end_to_end(spark):
    # JPEG rides the decode -> nn_resize -> re-encode path; re-encode is
    # lossy by format design, so the gate is a tolerance, not equality.
    from time_series_and_data_lakes_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        nn_resize,
        pixel_stats,
        resize_media,
    )

    # smooth gradient (what images look like locally — DCT's design case);
    # a noise image would be butchered by ANY standard-table JPEG encoder
    ys, xs = np.mgrid[0:96, 0:128]
    arr = np.stack(
        [(ys * 255) // 95, (xs * 255) // 127, ((ys + xs) * 255) // 221], axis=2
    ).astype(np.uint8)
    payload = jpeg_encode(arr, ONES, ONES)
    df = spark.createDataFrame(
        [(23, "image", payload, ("s3", "jpeg"))], MEDIA_SCHEMA
    )
    (row,) = resize_media(df, max_width=64, max_height=64).collect()
    got = jpeg_decode(bytes(row["payload"]))
    want = nn_resize(jpeg_decode(payload), 64, 48)
    assert got.shape == want.shape == (48, 64, 3)
    # the resize mixes source blocks, so the re-encode sees real high
    # frequencies: individual edge pixels ring (that IS JPEG), but the
    # mean absolute error stays small
    err = np.abs(got.astype(int) - want.astype(int))
    assert float(err.mean()) <= 5.0, float(err.mean())
    (st,) = pixel_stats(df).collect()
    assert (st["width"], st["height"]) == (128, 96)
    assert st["pixel_sum"] == int(jpeg_decode(payload).sum(dtype=np.int64))


def test_unsupported_layouts_raise_honestly():
    # Review findings (round 5): misclassification and silent-garbage
    # paths for legal-but-unimplemented JPEG layouts.
    def sof(nf, comps):
        body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([nf])
        for cid, samp, qid in comps:
            body += bytes([cid, samp, qid])
        return body

    # 4-component (Adobe CMYK): would decode as garbage through the
    # YCbCr transform — must raise, not return wrong pixels
    cmyk = b"\xff\xd8" + _seg(
        0xC0, sof(4, [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0), (4, 0x11, 0)])
    ) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="component"):
        jpeg_decode(cmyk)

    # lossless JPEG (SOF3): unimplemented coding process, not corrupt data
    sof3 = b"\xff\xd8" + _seg(0xC3, sof(1, [(1, 0x11, 0)])) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="lossless"):
        jpeg_decode(sof3)

    # multi-scan baseline (SOS lists fewer components than SOF)
    multi = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0]) + bytes([16] * 64))
        + _seg(0xC0, sof(3, [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0)]))
        + _seg(0xC4, bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0xE9, 0x2B])
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="multi-scan"):
        jpeg_decode(multi)


def test_single_component_scan_ignores_sampling_factors():
    # T.81 §A.2.2: a non-interleaved (single-component) scan's data units
    # are plain 8x8 blocks regardless of declared sampling factors — a
    # grayscale JPEG declaring samp 0x22 must decode, not desync.
    qt = bytes([0]) + bytes([16] * 64)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x22, 0])
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC0, sof)
        + _seg(0xC4, bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0xE9, 0x2B])
        + b"\xff\xd9"
    )
    out = jpeg_decode(jpg)
    assert out.shape == (8, 8, 3) and (out == 200).all()


def test_12bit_precision_raises_honestly():
    # Round-6 advice: SOF1 legally carries 12-bit samples; decoding them
    # through the 8-bit level-shift/clip path would return garbage.
    sof12 = bytes([12]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    jpg = b"\xff\xd8" + _seg(0xC1, sof12) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="12-bit"):
        jpeg_decode(jpg)


def test_undeclared_tables_and_truncated_segments_are_value_errors():
    # Corrupt-data-is-ValueError contract: streams referencing tables
    # they never declared, or carrying truncated segment bodies, must
    # never surface as KeyError / struct.error from the decode internals.
    qt = bytes([0]) + bytes([16] * 64)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    def jpg(*segs):
        return b"\xff\xd8" + b"".join(segs) + bytes([0xE9, 0x2B]) + b"\xff\xd9"

    # SOS references DC table 0 but no DHT was declared at all
    with pytest.raises(ValueError, match="undeclared DC Huffman"):
        jpeg_decode(jpg(_seg(0xDB, qt), _seg(0xC0, sof), _seg(0xDA, sos)))
    # AC table missing (only DC declared)
    with pytest.raises(ValueError, match="undeclared AC Huffman"):
        jpeg_decode(
            jpg(_seg(0xDB, qt), _seg(0xC0, sof), _seg(0xC4, dht_dc), _seg(0xDA, sos))
        )
    # SOF references quantization table 1; only table 0 declared
    sof_qt1 = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 1])
    with pytest.raises(ValueError, match="undeclared quantization"):
        jpeg_decode(
            jpg(
                _seg(0xDB, qt),
                _seg(0xC0, sof_qt1),
                _seg(0xC4, dht_dc),
                _seg(0xC4, dht_ac),
                _seg(0xDA, sos),
            )
        )
    # truncated DQT body (table cut mid-way)
    with pytest.raises(ValueError, match="truncated JPEG DQT"):
        jpeg_decode(jpg(_seg(0xDB, qt[:40]), _seg(0xC0, sof), _seg(0xDA, sos)))
    # truncated DHT body (symbol list cut)
    with pytest.raises(ValueError, match="truncated JPEG DHT"):
        jpeg_decode(
            jpg(_seg(0xDB, qt), _seg(0xC0, sof), _seg(0xC4, dht_dc[:20]), _seg(0xDA, sos))
        )
    # truncated SOF body (declares 3 components, carries 1)
    sof_short = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3, 1, 0x11, 0])
    with pytest.raises(ValueError, match="truncated JPEG SOF"):
        jpeg_decode(jpg(_seg(0xDB, qt), _seg(0xC0, sof_short), _seg(0xDA, sos)))
    # truncated DRI body
    with pytest.raises(ValueError, match="truncated JPEG DRI"):
        jpeg_decode(
            jpg(_seg(0xDB, qt), _seg(0xC0, sof), _seg(0xDD, b"\x01"), _seg(0xDA, sos))
        )
    # truncated SOS body (declares 1 component, carries none)
    with pytest.raises(ValueError, match="truncated JPEG SOS"):
        jpeg_decode(jpg(_seg(0xDB, qt), _seg(0xC0, sof), _seg(0xDA, bytes([1]))))
    # SOS with no preceding SOF is corrupt STRUCTURE (ValueError), not
    # the multi-scan NotImplementedError the component-count mismatch
    # branch would otherwise misreport it as
    with pytest.raises(ValueError, match="SOS appears before any SOF"):
        jpeg_decode(jpg(_seg(0xDB, qt), _seg(0xDA, sos)))
