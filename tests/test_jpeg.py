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
    jpeg_encode_progressive,
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
    # progressive (SOF2) without any scan is corrupt STRUCTURE now that
    # progressive itself decodes — same contract as the baseline case
    sof2 = (
        b"\xff\xd8"
        + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="without SOS"):
        jpeg_decode(sof2)
    # arithmetic coding (SOF9 sequential, SOF10 progressive)
    for marker in (0xC9, 0xCA):
        sofa = (
            b"\xff\xd8"
            + _seg(marker, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
            + b"\xff\xd9"
        )
        with pytest.raises(NotImplementedError, match="arithmetic"):
            jpeg_decode(sofa)
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

    # multi-scan sequential now DECODES through the coefficient-store
    # engine — see test_sequential_multi_scan_stream.


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


def test_12bit_extended_sequential_decodes():
    """Round-6 advice flagged 12-bit SOF1 streams decoding as garbage
    through the 8-bit level shift; they now decode for real, by hand
    derivation: flat 12-bit value 3210, qt=16 → DC = round(8*(3210-2048)
    /16) = 581, category 10 (K.3 code '11111110') + ten magnitude bits
    '1001000101' + EOB '1010' + two pad bits → FE 91 6B. The 12-bit
    reconstruction (level shift 2048, clip to 4095) is exact for a flat
    block, and the 8-bit downscale keeps the top byte: 3210>>4 = 200."""
    qt = bytes([0]) + bytes([16] * 64)
    sof12 = bytes([12]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC1, sof12)
        + _seg(0xC4, bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0xFE, 0x91, 0x6B])
        + b"\xff\xd9"
    )
    out = jpeg_decode(jpg)
    assert out.shape == (8, 8, 3)
    assert (out == 200).all()
    # the store engine honors 12-bit too: same image as a progressive
    # stream — DC first at Al=1 sends 581>>1 = 290 (category 9 =
    # '1111110' + '100100010' → FD 22), AC first sees a zero band
    # (EOB '1010' → AF), the DC refinement bit is 581&1 = 1 (a padded
    # 0xFF byte, stuffed to FF 00)
    prog = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC2, bytes([12]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        + bytes([0xFD, 0x22])
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + bytes([0xAF])
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
        + bytes([0xFF, 0x00])
        + b"\xff\xd9"
    )
    out = jpeg_decode(prog)
    assert (out == 200).all()
    # other precisions are corrupt headers, not unimplemented features
    sof10 = bytes([10]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    with pytest.raises(ValueError, match="precision 10"):
        jpeg_decode(b"\xff\xd8" + _seg(0xC1, sof10) + b"\xff\xd9")


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


# ---------------------------------------------------------------------------
# Progressive (SOF2) + multi-scan sequential coverage
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_decode():
    # The progressive encoder entropy-codes the SAME quantized
    # coefficients the sequential encoder produces, and the store-based
    # decoder reconstructs with the same per-block IDCT arithmetic — so
    # the two decode paths must agree BIT-FOR-BIT. This exercises DC
    # first/refine, spectral-band AC first scans, two levels of AC
    # refinement, EOB-run coding, and both MCU geometries.
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 256, (33, 61, 3), dtype=np.uint8)
    for sub in (False, True):
        for ri in (0, 3):
            base = jpeg_decode(
                jpeg_encode(arr, ONES, ONES, subsample=sub, restart_interval=ri)
            )
            prog = jpeg_decode(
                jpeg_encode_progressive(
                    arr, ONES, ONES, subsample=sub, restart_interval=ri
                )
            )
            assert np.array_equal(base, prog), (sub, ri)
    # real (lossy) Annex-K tables: same bit-for-bit agreement
    assert np.array_equal(
        jpeg_decode(jpeg_encode(arr)),
        jpeg_decode(jpeg_encode_progressive(arr)),
    )


def test_progressive_custom_band_script_roundtrips():
    # a finer spectral split with a deeper successive-approximation
    # ladder (Al=3 start) still reconstructs exactly
    scans = (
        ((0, 1, 2), 0, 0, 0, 3),
        ((0,), 1, 2, 0, 3),
        ((0,), 3, 63, 0, 3),
        ((1,), 1, 63, 0, 3),
        ((2,), 1, 63, 0, 3),
        ((0, 1, 2), 0, 0, 3, 2),
        ((0,), 1, 63, 3, 2),
        ((1,), 1, 63, 3, 2),
        ((2,), 1, 63, 3, 2),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0,), 1, 63, 2, 1),
        ((1,), 1, 63, 2, 1),
        ((2,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 1, 0),
    )
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(arr, ONES, ONES))
    prog = jpeg_decode(jpeg_encode_progressive(arr, ONES, ONES, scans=scans))
    assert np.array_equal(base, prog)


def test_progressive_hand_derived_stream():
    """Independent-of-our-encoder gate, progressive edition: flat value
    200, qt=16 → the block's only coefficient is DC = 36. Scan 1 (DC
    first, Al=1) transmits 36>>1 = 18: K.3 DC category 5 = '110', five
    magnitude bits '10010' → 0xD2. Scan 2 (AC first, Ss=1..63, Al=0)
    sees an all-zero band: EOB0 = '1010', padded to 0xAF. Scan 3 (DC
    refinement, Ah=1→Al=0) sends the held-back low bit, 36&1 = 0,
    padded to 0x7F. A correct engine reassembles DC=36 → flat 200."""
    qt = bytes([0]) + bytes([16] * 64)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS)
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC2, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # DC first, Al=1
        + bytes([0xD2])
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))  # AC first, full band
        + bytes([0xAF])
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # DC refine, Ah=1
        + bytes([0x7F])
        + b"\xff\xd9"
    )
    out = jpeg_decode(jpg)
    assert out.shape == (8, 8, 3)
    assert (out == 200).all()


def test_progressive_partial_stream_still_renders():
    # the POINT of progressive JPEG: a prefix that ends cleanly after
    # the DC scan renders a coarse image instead of failing. Flat input
    # reconstructs exactly from its DC scan alone (Al=0 here).
    arr = np.full((16, 16, 3), 77, np.uint8)
    scans = (((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 63, 0, 0),
             ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0))
    full = jpeg_encode_progressive(arr, ONES, ONES, scans=scans)
    # cut right before the second SOS segment, keep the EOI
    second_sos = full.find(b"\xff\xda", full.find(b"\xff\xda") + 2)
    assert second_sos > 0
    out = jpeg_decode(full[:second_sos] + b"\xff\xd9")
    assert np.array_equal(out, arr)


def test_sequential_multi_scan_stream():
    """Non-interleaved SEQUENTIAL stream (SOF0 + one full scan per
    component) through the same store engine, hand-derived: Y scan
    carries DC 36 ('1110'+'100100'+EOB'1010' → 0xE9 0x2B), both chroma
    scans carry DC 0 ('00'+EOB'1010' → 0x2B) — a flat gray 200."""
    qt = bytes([0]) + bytes([16] * 64)
    sof = (
        bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    dht_dc = bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS)
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0xE9, 0x2B])
        + _seg(0xDA, bytes([1, 2, 0x00, 0, 63, 0]))
        + bytes([0x2B])
        + _seg(0xDA, bytes([1, 3, 0x00, 0, 63, 0]))
        + bytes([0x2B])
        + b"\xff\xd9"
    )
    out = jpeg_decode(jpg)
    assert out.shape == (8, 8, 3)
    assert (out == 200).all()


def test_progressive_scan_header_contracts():
    # corrupt or out-of-spec scan headers are ValueError, never a
    # desynced-garbage decode or an internal error
    qt = bytes([0]) + bytes([16] * 64)
    sof3c = (
        bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    dht_dc = bytes([0x00]) + bytes(_K_DC_BITS) + bytes(_K_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_K_AC_BITS) + bytes(_K_AC_VALS)
    head = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC2, sof3c)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
    )

    def jpg(sos_body, entropy=b"\x00"):
        return head + _seg(0xDA, sos_body) + entropy + b"\xff\xd9"

    # AC scan listing more than one component
    with pytest.raises(ValueError, match="single-component"):
        jpeg_decode(jpg(bytes([3, 1, 0, 2, 0, 3, 0, 1, 63, 0])))
    # DC scan with a nonzero Se
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(jpg(bytes([1, 1, 0, 0, 5, 0])))
    # band end past 63
    with pytest.raises(ValueError, match="out of range"):
        jpeg_decode(jpg(bytes([1, 1, 0, 32, 64, 0])))
    # successive-approximation shift out of range (Ah=14)
    with pytest.raises(ValueError, match="Ah=14"):
        jpeg_decode(jpg(bytes([1, 1, 0, 0, 0, 0xE0])))
    # refinement scan decoding a magnitude category other than 1: K.3
    # AC code '01' is symbol 0x02 (run 0, size 2) — illegal mid-refine
    with pytest.raises(ValueError, match="magnitude"):
        jpeg_decode(jpg(bytes([1, 1, 0x00, 1, 63, 0x10]), b"\x7f"))
    # a second SOF after scans began is corrupt structure
    with pytest.raises(ValueError, match="second SOF"):
        jpeg_decode(
            head
            + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
            + bytes([0xD2])
            + _seg(0xC2, sof3c)
            + b"\xff\xd9"
        )
    # a scan whose tables were never declared
    bare = b"\xff\xd8" + _seg(0xDB, qt) + _seg(0xC2, sof3c)
    with pytest.raises(ValueError, match="undeclared DC Huffman"):
        jpeg_decode(bare + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + b"\xff\xd9")
    with pytest.raises(ValueError, match="undeclared AC Huffman"):
        jpeg_decode(
            bare
            + _seg(0xC4, dht_dc)
            + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
            + b"\xff\xd9"
        )


def test_progressive_random_scan_scripts_reconstruct_exactly():
    """Property gate over the scan-script space: ANY spectral partition
    of 1..63 with ANY per-band successive-approximation ladder (each
    refinement stepping Al down by one to zero) must reconstruct the
    SAME coefficients the sequential stream carries — decode equality is
    bit-for-bit. Randomized bands exercise EOB runs that straddle
    blocks, ZRL-in-refinement, and correction-bit buffering at band
    boundaries the fixed scripts never hit."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        cuts=st.sets(st.integers(2, 63), max_size=4),
        dc_al=st.integers(0, 2),
        band_al_seed=st.integers(0, 2**31 - 1),
        sub=st.booleans(),
    )
    def check(seed, cuts, dc_al, band_al_seed, sub):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (17, 22, 3), dtype=np.uint8)
        bounds = [1] + sorted(cuts) + [64]
        bands = [
            (bounds[i], bounds[i + 1] - 1)
            for i in range(len(bounds) - 1)
            if bounds[i] <= bounds[i + 1] - 1
        ]
        al_rng = np.random.default_rng(band_al_seed)
        band_als = [int(al_rng.integers(0, 3)) for _ in bands]
        scans = [((0, 1, 2), 0, 0, 0, dc_al)]
        for comp in (0, 1, 2):
            for (lo, hi), al0 in zip(bands, band_als):
                scans.append(((comp,), lo, hi, 0, al0))
        for al in range(max([dc_al] + band_als) - 1, -1, -1):
            if al < dc_al:
                scans.append(((0, 1, 2), 0, 0, al + 1, al))
            for comp in (0, 1, 2):
                for (lo, hi), al0 in zip(bands, band_als):
                    if al < al0:
                        scans.append(((comp,), lo, hi, al + 1, al))
        base = jpeg_decode(jpeg_encode(arr, ONES, ONES, subsample=sub))
        prog = jpeg_decode(
            jpeg_encode_progressive(
                arr, ONES, ONES, subsample=sub, scans=tuple(scans)
            )
        )
        assert np.array_equal(base, prog)

    check()


def test_progressive_random_corruptions_of_legal_scripts_rejected():
    """Adversarial twin of the reconstruct-exactly property: take a random
    LEGAL scan script and break it four ways — duplicate a first pass,
    orphan a refinement (drop its band's entire ladder), skip a
    successive-approximation step, use an out-of-range component — and
    every corruption must be a descriptive ValueError at encode time,
    never a silently corrupt stream."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        cuts=st.sets(st.integers(2, 63), max_size=4),
        dc_al=st.integers(0, 2),
        band_al_seed=st.integers(0, 2**31 - 1),
        pick_seed=st.integers(0, 2**31 - 1),
    )
    def check(cuts, dc_al, band_al_seed, pick_seed):
        arr = np.full((8, 8, 3), 10, np.uint8)
        bounds = [1] + sorted(cuts) + [64]
        bands = [
            (bounds[i], bounds[i + 1] - 1)
            for i in range(len(bounds) - 1)
            if bounds[i] <= bounds[i + 1] - 1
        ]
        al_rng = np.random.default_rng(band_al_seed)
        band_als = [int(al_rng.integers(0, 3)) for _ in bands]
        scans = [((0, 1, 2), 0, 0, 0, dc_al)]
        for comp in (0, 1, 2):
            for (lo, hi), al0 in zip(bands, band_als):
                scans.append(((comp,), lo, hi, 0, al0))
        for al in range(max([dc_al] + band_als) - 1, -1, -1):
            if al < dc_al:
                scans.append(((0, 1, 2), 0, 0, al + 1, al))
            for comp in (0, 1, 2):
                for (lo, hi), al0 in zip(bands, band_als):
                    if al < al0:
                        scans.append(((comp,), lo, hi, al + 1, al))
        # the uncorrupted script is legal
        jpeg_encode_progressive(arr, scans=tuple(scans))

        rng = np.random.default_rng(pick_seed)
        lo, hi = bands[int(rng.integers(0, len(bands)))]

        # (a) duplicate a random Ah=0 scan -> double first-code
        firsts = [s for s in scans if s[3] == 0]
        dup = firsts[int(rng.integers(0, len(firsts)))]
        with pytest.raises(ValueError, match="first-coded by two"):
            jpeg_encode_progressive(arr, scans=tuple([*scans, dup]))

        # (b) orphan refinement: drop one band's whole comp-0 ladder, then
        # refine it anyway
        dropped = [s for s in scans if not (s[0] == (0,) and s[1] == lo)]
        with pytest.raises(ValueError, match="never first-coded"):
            jpeg_encode_progressive(
                arr, scans=tuple([*dropped, ((0,), lo, hi, 1, 0)])
            )

        # (c) skip a successive-approximation step where a ladder exists
        laddered = [
            (i, s)
            for i, s in enumerate(scans)
            if s[0] == (0,) and s[1] != 0 and s[3] == s[4] + 1 and s[3] >= 2
        ]
        if laddered:
            i, s = laddered[0]
            skipped = scans[:i] + scans[i + 1 :]  # its Ah-1 successor orphans
            with pytest.raises(ValueError, match="currently at Al="):
                jpeg_encode_progressive(arr, scans=tuple(skipped))

        # (d) out-of-range component id
        with pytest.raises(ValueError, match="component ids"):
            jpeg_encode_progressive(
                arr, scans=tuple([*scans, ((3,), lo, hi, 0, 0)])
            )

    check()


def test_progressive_encoder_rejects_malformed_scripts():
    arr = np.full((8, 8, 3), 10, np.uint8)
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_encode_progressive(arr, scans=(((0, 1, 2), 0, 5, 0, 0),))
    with pytest.raises(ValueError, match="single-component"):
        jpeg_encode_progressive(arr, scans=(((0, 1), 1, 63, 0, 0),))
    with pytest.raises(ValueError, match="Ah=Al"):
        jpeg_encode_progressive(arr, scans=(((0,), 1, 63, 2, 0),))
    # component ids outside 0..2 (or repeated) get a descriptive
    # ValueError, not a bare IndexError from comps_geo/zz indexing
    with pytest.raises(ValueError, match="component ids"):
        jpeg_encode_progressive(arr, scans=(((3,), 1, 63, 0, 0),))
    with pytest.raises(ValueError, match="component ids"):
        jpeg_encode_progressive(arr, scans=(((-1,), 1, 63, 0, 0),))
    with pytest.raises(ValueError, match="component ids"):
        jpeg_encode_progressive(arr, scans=(((0, 0, 1), 0, 0, 0, 0),))
    # a coefficient band may be FIRST-coded (Ah=0) only once per component;
    # overlapping first passes would emit a corrupt stream
    with pytest.raises(ValueError, match="first-coded by two"):
        jpeg_encode_progressive(
            arr,
            scans=(
                ((0, 1, 2), 0, 0, 0, 0),
                ((0,), 1, 10, 0, 0),
                ((0,), 5, 20, 0, 0),
            ),
        )
    # a refinement over a band never first-coded (or sitting at a different
    # Al) would also emit a corrupt stream — T.81 successive approximation
    # steps one bit at a time from the band's first-coded level
    with pytest.raises(ValueError, match="never first-coded"):
        jpeg_encode_progressive(
            arr, scans=(((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 63, 1, 0))
        )
    with pytest.raises(ValueError, match="currently at Al=2"):
        jpeg_encode_progressive(
            arr,
            scans=(
                ((0, 1, 2), 0, 0, 0, 0),
                ((0,), 1, 63, 0, 2),
                ((0,), 1, 63, 1, 0),  # skips the Ah=2 -> Al=1 step
            ),
        )


def test_stray_standalone_markers_before_sos_are_skipped():
    """T.81 tolerates standalone markers (TEM, stray RSTn) in the header
    section; treating them as length-prefixed segments read the next
    marker's bytes as a ~64 KB length and lost the stream (the sibling
    walks in jpeg_dims and _decode_multi already skipped them)."""
    arr = np.full((8, 8, 3), 77, np.uint8)
    clean = jpeg_encode(arr)
    assert clean[:2] == b"\xff\xd8"
    patched = clean[:2] + b"\xff\xd0\xff\x01" + clean[2:]
    assert np.array_equal(jpeg_decode(patched), jpeg_decode(clean))
