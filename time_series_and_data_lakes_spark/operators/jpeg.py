"""JPEG codec (ITU T.81, baseline + progressive DCT) in pure numpy/stdlib.

JPEG's entropy coding is canonical Huffman over run-length-coded,
zigzag-ordered, quantized 8x8 DCT blocks — pure arithmetic, so like the
PNG (zlib) and GIF (LZW) codecs no external library is required; PIL
would provide speed, not capability. Implemented:

- ``jpeg_decode``: sequential AND progressive — DQT (8/16-bit), DHT
  (canonical build), SOF0/1/2 at 8- OR 12-bit precision (12-bit
  reconstructs at full depth, keeps the top byte — the PNG 16→8
  convention), DRI + restart markers, interleaved MCUs with sampling
  factors to 2x2 (4:4:4/4:2:2/4:2:0), byte-destuffing bit reader,
  dequant → IDCT → level shift, nearest chroma upsample, JFIF YCbCr→RGB.
  Single-scan sequential streams decode directly; multi-scan sequential
  and progressive (SOF2) run through a coefficient-store engine
  (``_decode_multi``): each SOS — spectral bands, successive-approximation
  first/refinement passes for DC and AC, EOB runs (T.81 §G.1.2) —
  accumulates per component, reconstructed once at end-of-stream with the
  direct path's per-block IDCT arithmetic. Arithmetic coding and
  lossless/hierarchical processes raise ``NotImplementedError`` honestly.
- ``jpeg_encode``: baseline sequential encode (4:4:4 or 4:2:0) with
  caller-suppliable quantization tables. The Huffman tables are a valid
  fixed-length canonical set (12 DC symbols at 4 bits, 162 AC symbols at
  8 bits — Kraft-feasible with the all-ones code unused, as §C.2
  requires) rather than the Annex K defaults: any conforming decoder
  reads the tables from the DHT segments, so compression is traded for
  a table set that is trivially auditable.
- ``jpeg_encode_progressive``: progressive (SOF2) encode over the same
  quantized coefficients ``jpeg_encode`` produces, with a caller-
  suppliable scan script (default: the conventional ten-scan
  DC-first/spectral-band/successive-approximation schedule). The AC
  table is a fixed-length canonical set extended with the EOBn symbols
  progressive coding needs (176 symbols at 8 bits).

Determinism: both directions use the same float64 DCT basis; encoder
quantization rounds half AWAY FROM ZERO (symmetric for both signs) and
decoder sample rounding is half-up (``floor(x + 0.5)`` — never numpy's
half-to-even), so decode(encode(x, quant=ones)) differs from x only by
the DCT round-trip's rounding — bounded by a few counts per sample
(asserted in tests); flat blocks reconstruct exactly.

JPEG is inherently lossy at useful table settings: re-encoding a
resized image produces approximate pixels by design. The per-symbol
Huffman loops run interpreted; like the PNG defilter path this is the
honest cost of stdlib-only decode — ~0.26 s/720p sequential decode and
~0.7 s encode after the 16-bit lookahead LUT, the batched IDCT, and
the trimmed writer accumulator (progressive costs ~2-3x the entropy
passes by design), bounded per Arrow batch row.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# k-th zigzag coefficient -> raster index in the 8x8 block (T.81 fig. 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

_C = np.array([1 / np.sqrt(2)] + [1.0] * 7)
_DCT_A = np.array([
    [_C[u] / 2 * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])

# ITU T.81 Annex K.1 example quantization tables (the de-facto defaults)
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Fixed-length canonical Huffman sets for the encoder: DC symbols 0..11
# at 4 bits each; AC symbols (EOB, ZRL, and (run,size) run 0-15 size
# 1-10) at 8 bits each. 12/16 and 162/256 satisfy Kraft with the
# all-ones code unused.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 §C.2 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(
    bits: list[int], symbols: list[int]
) -> tuple[dict[tuple[int, int], int], list[int]]:
    """Decoder table in two forms: the ``(length, code) -> symbol`` dict
    (bit-by-bit fallback near stream end) and a 65536-entry lookahead LUT —
    ``lut[window16] = (code_length << 8) | symbol`` for the unique code
    prefixing that 16-bit window, 0 where no code matches. One table lookup
    replaces up to 16 ``read_bit`` calls in the entropy hot loop."""
    return _decode_table_cached(tuple(bits), tuple(symbols))


@lru_cache(maxsize=64)
def _decode_table_cached(
    bits: tuple[int, ...], symbols: tuple[int, ...]
) -> tuple[dict[tuple[int, int], int], list[int]]:
    codes = _canonical_codes(list(bits), list(symbols))
    table = {(length, code): sym for sym, (code, length) in codes.items()}
    lut = [0] * 65536
    for sym, (code, length) in codes.items():
        base = code << (16 - length)
        entry = (length << 8) | sym
        lut[base : base + (1 << (16 - length))] = [entry] * (1 << (16 - length))
    return table, lut


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            # trim emitted bits so acc stays a machine int — an untrimmed
            # accumulator grows with the whole stream and its shifts go
            # quadratic (same hardening as _BitReader._fill_quiet;
            # measured 3.7s of a 4.5s 720p encode before the trim)
            self.acc &= (1 << self.nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (§B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (§F.1.2.3)
        return bytes(self.out)


class _BitReader:
    """MSB-first entropy-coded-segment reader with 0xFF00 destuffing;
    stops at any non-stuffing marker (caller inspects ``marker``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill_quiet(self) -> bool:
        """Buffer one more entropy byte; False (no raise) at a marker or
        the end of data. Maintains ``acc < 2**nbits`` — consumers trim
        ``acc`` so it stays a machine int instead of accreting the whole
        stream into one ever-growing bigint (whose shifts go quadratic)."""
        if self.marker is not None or self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt if nxt is not None else 0xD9
                self.pos += 1
                return False
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data ended at marker")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        if not self._fill_quiet():
            raise ValueError("JPEG entropy data ended at marker")

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> tuple[int, int]:
        """Next up-to-16 bits, MSB-aligned and zero-padded, plus how many
        of them are real. Never raises — buffers quietly toward 16 bits and
        stops at a marker or the end of data."""
        while self.nbits < 16 and self._fill_quiet():
            pass
        n = self.nbits
        if n >= 16:
            return (self.acc >> (n - 16)) & 0xFFFF, 16
        return (self.acc << (16 - n)) & 0xFFFF, n

    def consume(self, n: int) -> None:
        """Drop ``n`` already-peeked bits (``n <= nbits``)."""
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def align_past_restart(self) -> None:
        """Consume a RSTn marker at an MCU boundary and realign."""
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            # peek16's quiet lookahead already stepped past the marker while
            # decoding the interval's last symbol; the buffered leftover is
            # the pre-marker padding — discard it and realign
            self.acc = 0
            self.nbits = 0
            self.marker = None
            return
        self.acc = 0
        self.nbits = 0
        self.marker = None
        # skip fill bytes then the marker itself
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            if 0xD0 <= m <= 0xD7:
                self.pos += 2
                return
            if m == 0xFF:
                self.pos += 1
                continue
            break
        raise ValueError("expected JPEG restart marker")


def _read_huffman(
    reader: _BitReader, table: tuple[dict[tuple[int, int], int], list[int]]
) -> int:
    by_code, lut = table
    window, avail = reader.peek16()
    if avail == 16:
        entry = lut[window]
        if entry:
            reader.consume(entry >> 8)
            return entry & 0xFF
        raise ValueError("invalid JPEG Huffman code")
    # stream tail (< 16 bits before a marker / EOF): replay bit by bit so a
    # code completing within the real bits decodes, and a code that doesn't
    # raises the same truncated/marker ValueError as the eager reader did
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = by_code.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _parse_dqt(body: bytes, qts: dict) -> None:
    j = 0
    while j < len(body):
        precision, tid = body[j] >> 4, body[j] & 0x0F
        j += 1
        need = 128 if precision else 64
        if j + need > len(body):
            raise ValueError(
                f"truncated JPEG DQT segment: table {tid} needs "
                f"{need} bytes, {len(body) - j} remain"
            )
        if precision:
            vals = np.frombuffer(body, ">u2", 64, offset=j)
            j += 128
        else:
            vals = np.frombuffer(body, np.uint8, 64, offset=j)
            j += 64
        table = np.zeros(64, np.int32)
        table[ZIGZAG] = vals
        qts[tid] = table.reshape(8, 8)


def _parse_dht(body: bytes, huff: dict) -> None:
    j = 0
    while j < len(body):
        tclass, tid = body[j] >> 4, body[j] & 0x0F
        if j + 17 > len(body):
            raise ValueError("truncated JPEG DHT segment: bits list cut")
        bits = list(body[j + 1 : j + 17])
        count = sum(bits)
        if j + 17 + count > len(body):
            raise ValueError(
                f"truncated JPEG DHT segment: table ({tclass},{tid}) "
                f"declares {count} symbols, "
                f"{len(body) - j - 17} remain"
            )
        symbols = list(body[j + 17 : j + 17 + count])
        huff[(tclass, tid)] = _decode_table(bits, symbols)
        j += 17 + count


def jpeg_decode(payload: bytes) -> "np.ndarray":
    """Sequential or progressive JPEG → (h, w, 3) uint8 RGB (grayscale
    replicated). See module docstring for supported surface."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    precision = 8
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers (TEM, stray RSTn, a repeated SOI) carry
            # no length word — treating the next two bytes as a segment
            # length jumps past the real stream (the sibling walks in
            # jpeg_dims and _decode_multi already skip these)
            i += 2
            continue
        if marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE):
            raise NotImplementedError("arithmetic-coded JPEG not implemented")
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCF):
            raise NotImplementedError(
                "lossless/differential JPEG (SOF3/5/6/7/15) not implemented"
            )
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        body = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(body, qts)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 (seq/ext-seq/prog)
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF segment header")
            if body[0] not in (8, 12):
                # DCT processes carry 8- or 12-bit samples only
                # (T.81 table B.2); anything else is a corrupt header
                raise ValueError(
                    f"illegal JPEG DCT sample precision {body[0]}"
                )
            precision = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            if len(body) < 6 + 3 * body[5]:
                raise ValueError(
                    f"truncated JPEG SOF segment: {body[5]} components "
                    f"declared, body holds {len(body)} bytes"
                )
            comps = []
            for k in range(body[5]):
                cid, samp, qid = body[6 + 3 * k : 9 + 3 * k]
                ch, cv = samp >> 4, samp & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    # T.81 B.2.2 bounds Hi/Vi to 1..4; a zero factor from
                    # a bit flip otherwise divides by zero in the
                    # chroma-upsample step (fuzz-found)
                    raise ValueError(
                        f"JPEG SOF sampling factors {ch}x{cv} out of the "
                        f"legal 1..4 range"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "qt": qid})
            if len(comps) not in (1, 3):
                # 4-comp Adobe CMYK/YCCK would silently decode as garbage
                # through the YCbCr transform; 2-comp is exotic-but-legal.
                raise NotImplementedError(
                    f"only 1- or 3-component (grayscale/YCbCr) JPEG "
                    f"implemented (got {len(comps)} components)"
                )
            if len(comps) == 1:
                # a single-component scan is non-interleaved: its data
                # units are plain ceil(w/8) x ceil(h/8) blocks and the
                # declared sampling factors do NOT shape the MCU
                # (T.81 §A.2.2)
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                # legal but exotic: our chroma upsample replicates by the
                # integer ratio to the max factor (covers 4:4:4/4:2:2/
                # 4:2:0/4:1:1); a non-divisible layout (3:2) would
                # silently mis-shape, so raise honestly
                raise NotImplementedError(
                    "non-integer-ratio chroma subsampling not implemented "
                    f"(factors {[(c['h'], c['v']) for c in comps]})"
                )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            if not comps:
                # corrupt structure, not an unsupported layout: a legal
                # stream always declares SOF before its first SOS
                raise ValueError("JPEG SOS appears before any SOF segment")
            if progressive or body[0] != len(comps):
                # progressive and multi-scan sequential streams both
                # accumulate coefficients across scans — hand the whole
                # remaining stream (from this SOS marker) to the
                # store-based engine
                return _decode_multi(
                    b, i, w, h, comps, qts, huff, restart_interval,
                    progressive, precision,
                )
            for k in range(body[0]):
                cid, tids = body[1 + 2 * k], body[2 + 2 * k]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"], c["ac"] = tids >> 4, tids & 0x0F
            if any("dc" not in c for c in comps):
                raise ValueError("JPEG SOS references unknown component ids")
            # corrupt-data-is-ValueError contract: a stream referencing
            # tables it never declared must not surface as KeyError in
            # the scan loop.
            for c in comps:
                if (0, c["dc"]) not in huff:
                    raise ValueError(
                        f"JPEG SOS references undeclared DC Huffman "
                        f"table {c['dc']}"
                    )
                if (1, c["ac"]) not in huff:
                    raise ValueError(
                        f"JPEG SOS references undeclared AC Huffman "
                        f"table {c['ac']}"
                    )
                if c["qt"] not in qts:
                    raise ValueError(
                        f"JPEG SOF references undeclared quantization "
                        f"table {c['qt']}"
                    )
            i = i + 2 + seg_len
            return _decode_scan(
                b, i, w, h, comps, qts, huff, restart_interval, precision
            )
        i += 2 + seg_len
    raise ValueError("JPEG without SOS scan")


def _decode_scan(b, pos, w, h, comps, qts, huff, restart_interval, precision=8):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    store = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)
        for c in comps
    ]
    max_cat = 11 if precision == 8 else 15
    reader = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_past_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff[(0, c["dc"])]
                ac_tab = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = store[ci][my * c["v"] + by, mx * c["h"] + bx]
                        size = _read_huffman(reader, dc_tab)
                        if size > max_cat:
                            # legal DC categories are 0..11 at 8-bit /
                            # 0..15 at 12-bit precision (T.81 F.1.2.1.2);
                            # a corrupt entropy stream can decode a symbol
                            # up to 255, whose 1<<size difference overflows
                            # the coefficient store (fuzz-found)
                            raise ValueError(
                                f"corrupt JPEG entropy stream: DC "
                                f"category {size} out of range"
                            )
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        coeffs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_huffman(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            size = sym & 0x0F
                            coeffs[k] = _extend(reader.read_bits(size), size)
                            k += 1
            mcu_index += 1
    planes = _idct_planes(store, comps, qts, precision)
    return _finish_rgb(planes, comps, w, h, hmax, vmax)


def _idct_planes(store, comps, qts, precision):
    """Per-component zigzag coefficient stores → float64 sample planes:
    one BATCHED dequant + IDCT over all of a component's blocks (np's
    stacked matmul runs the identical 8x8 GEMM per block, so results
    are BIT-IDENTICAL to the former per-block loop — asserted by
    test_progressive_equals_baseline_decode and the hand-derived
    streams — at ~4x the throughput)."""
    center = float(1 << (precision - 1))  # level shift: 128 or 2048
    planes = []
    for ci, c in enumerate(comps):
        if c["qt"] not in qts:
            raise ValueError(
                f"JPEG SOF references undeclared quantization "
                f"table {c['qt']}"
            )
        qt = qts[c["qt"]].astype(np.float64)
        rows, cols = store[ci].shape[:2]
        blocks = np.zeros((rows * cols, 64), np.float64)
        blocks[:, ZIGZAG] = store[ci].reshape(rows * cols, 64)
        px = _DCT_A.T @ (blocks.reshape(-1, 8, 8) * qt) @ _DCT_A + center
        plane = (
            px.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        if precision == 12:
            plane = _downscale_12bit(plane)
        planes.append(plane)
    return planes


def _downscale_12bit(plane: "np.ndarray") -> "np.ndarray":
    """12-bit sample plane → 8-bit scale: half-up round, clip to the
    12-bit range, keep the top 8 bits (floor(v/16)) — the same
    sample-depth convention the PNG 16→8 path uses. Returned as float64
    integers so :func:`_finish_rgb`'s 8-bit rounding is an identity on
    grayscale and applies only to the color-transform fractions."""
    return np.floor(np.clip(np.floor(plane + 0.5), 0.0, 4095.0) / 16.0)


def _finish_rgb(planes, comps, w, h, hmax, vmax):
    """Crop/upsample per-component sample planes and apply the JFIF
    color transform — shared by the direct and store-based decoders."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci][: -(-h * c["v"] // vmax) or None, : -(-w * c["h"] // hmax) or None]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _parse_sos_multi(body, comps, huff, progressive):
    """Parse + validate one SOS header for the store-based engine.

    Returns ``(scomps, ss, se, ah, al)`` where ``scomps`` is a list of
    ``(component_index, dc_table_id, ac_table_id)`` in scan order. All
    structural defects raise ValueError (corrupt-data contract)."""
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise ValueError("truncated JPEG SOS segment")
    if not 1 <= ns <= len(comps):
        raise ValueError(
            f"JPEG SOS declares {ns} components, frame has {len(comps)}"
        )
    scomps = []
    for k in range(ns):
        cid, tids = body[1 + 2 * k], body[2 + 2 * k]
        ci = next((j for j, c in enumerate(comps) if c["id"] == cid), None)
        if ci is None:
            raise ValueError("JPEG SOS references unknown component ids")
        scomps.append((ci, tids >> 4, tids & 0x0F))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
    if not progressive:
        # sequential scans carry fixed (0, 63, 0) band bytes; decode the
        # full block regardless of what a sloppy encoder wrote there
        ss, se, ah, al = 0, 63, 0, 0
    if se > 63 or (ss > se):
        raise ValueError(f"JPEG scan band Ss={ss}..Se={se} out of range")
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError(
                f"progressive JPEG DC scan must have Se=0 (got Se={se})"
            )
        if ss > 0 and ns != 1:
            raise ValueError(
                "progressive JPEG AC scan must be single-component "
                f"(got {ns})"
            )
        if ah > 13 or al > 13:
            # T.81 bounds the successive-approximation point transform;
            # a corrupt byte otherwise drives unbounded coefficient shifts
            raise ValueError(
                f"JPEG successive approximation Ah={ah}/Al={al} out of range"
            )
    for ci, dcid, acid in scomps:
        needs_dc = ss == 0 and (ah == 0 or not progressive)
        needs_ac = se > 0
        if needs_dc and (0, dcid) not in huff:
            raise ValueError(
                f"JPEG SOS references undeclared DC Huffman table {dcid}"
            )
        if needs_ac and (1, acid) not in huff:
            raise ValueError(
                f"JPEG SOS references undeclared AC Huffman table {acid}"
            )
    return scomps, ss, se, ah, al


def _scan_units(scomps, comps, w, h, hmax, vmax, mcus_x, mcus_y):
    """Yield one data-unit list per restart unit: the MCU's blocks for an
    interleaved (Ns>1) scan, a single block for a non-interleaved scan
    (T.81 §A.2: Ns=1 scans cover only the blocks that tile the
    component's actual samples, not the MCU padding)."""
    if len(scomps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for ci, dcid, acid in scomps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx,
                                 dcid, acid)
                            )
                yield unit
    else:
        ci, dcid, acid = scomps[0]
        c = comps[ci]
        nbx = -(-(-(-w * c["h"] // hmax)) // 8)
        nby = -(-(-(-h * c["v"] // vmax)) // 8)
        for r in range(nby):
            for cl in range(nbx):
                yield [(ci, r, cl, dcid, acid)]


def _decode_scan_into(
    b, pos, store, scomps, comps, ss, se, ah, al,
    w, h, hmax, vmax, mcus_x, mcus_y, huff, restart_interval, progressive,
    precision=8,
):
    """Decode one entropy-coded scan into the coefficient stores and
    return the stream index of the next marker (T.81 §G.1.2 for the
    progressive DC/AC first/refinement passes and EOB-run coding)."""
    reader = _BitReader(b, pos)
    preds = {ci: 0 for ci, _d, _a in scomps}
    eobrun = 0
    p1 = 1 << al
    if progressive:
        mode = (
            "dc_first" if ss == 0 and ah == 0
            else "dc_refine" if ss == 0
            else "ac_first" if ah == 0
            else "ac_refine"
        )
    else:
        mode = "seq"
    ui = 0
    for unit in _scan_units(scomps, comps, w, h, hmax, vmax, mcus_x, mcus_y):
        if restart_interval and ui and ui % restart_interval == 0:
            reader.align_past_restart()
            preds = {ci: 0 for ci in preds}
            eobrun = 0
        for ci, r, cl, dcid, acid in unit:
            blk = store[ci][r, cl]
            if mode == "dc_refine":
                blk[0] |= reader.read_bit() << al
                continue
            if mode in ("seq", "dc_first"):
                size = _read_huffman(reader, huff[(0, dcid)])
                if size > (11 if precision == 8 else 15):
                    raise ValueError(
                        f"corrupt JPEG entropy stream: DC "
                        f"category {size} out of range"
                    )
                preds[ci] += _extend(reader.read_bits(size), size)
                blk[0] = preds[ci] << al
                if mode == "dc_first":
                    continue
            if mode in ("seq", "ac_first"):
                if mode == "ac_first" and eobrun:
                    eobrun -= 1
                    continue
                ac_tab = huff[(1, acid)]
                k = max(ss, 1)
                while k <= se:
                    sym = _read_huffman(reader, ac_tab)
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        if mode == "seq":  # EOB
                            break
                        eobrun = 1 << run
                        if run:
                            eobrun += reader.read_bits(run)
                        eobrun -= 1  # this block is the run's first
                        break
                    k += run
                    if k > se:
                        raise ValueError("JPEG AC run past band end")
                    blk[k] = _extend(reader.read_bits(size), size) << al
                    k += 1
                continue
            # ac_refine (T.81 §G.1.2.3): correction bits for history-
            # nonzero coefficients, ±(1<<Al) for newly-significant ones
            if eobrun:
                for k in range(ss, se + 1):
                    if blk[k] != 0 and reader.read_bit() and not (
                        int(blk[k]) & p1
                    ):
                        blk[k] += p1 if blk[k] > 0 else -p1
                eobrun -= 1
                continue
            ac_tab = huff[(1, acid)]
            k = ss
            while k <= se:
                sym = _read_huffman(reader, ac_tab)
                run, size = sym >> 4, sym & 0x0F
                newval = 0
                if size == 0:
                    if run < 15:  # EOBn: corrections for the band's rest
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += reader.read_bits(run)
                        while k <= se:
                            if blk[k] != 0 and reader.read_bit() and not (
                                int(blk[k]) & p1
                            ):
                                blk[k] += p1 if blk[k] > 0 else -p1
                            k += 1
                        break
                    # ZRL: skip 16 zero-history coefficients
                else:
                    if size != 1:
                        raise ValueError(
                            "corrupt JPEG refinement scan: magnitude "
                            f"category {size} (must be 1)"
                        )
                    newval = p1 if reader.read_bit() else -p1
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and not (int(blk[k]) & p1):
                            blk[k] += p1 if blk[k] > 0 else -p1
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if k <= se and newval:
                    blk[k] = newval
                k += 1
        ui += 1
    # resume the marker walk at the next marker: either the one the
    # reader already stopped at, or the first one past the final
    # entropy byte (trailing pad bits are discarded with the buffer)
    if reader.marker is not None:
        return reader.pos - 2
    p = reader.pos
    n = len(b)
    while p + 1 < n:
        if b[p] == 0xFF and b[p + 1] != 0x00 and b[p + 1] != 0xFF:
            return p
        p += 1
    return n


def _decode_multi(
    b, i, w, h, comps, qts, huff, restart_interval, progressive, precision=8
):
    """Store-based decode for progressive (SOF2) and multi-scan
    sequential streams, entered at the first SOS marker: every scan
    accumulates into per-component zigzag coefficient stores;
    dequantization + IDCT happen once at end of stream, with the same
    per-block arithmetic as the direct path."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    store = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)
        for c in comps
    ]
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7:  # stray restart between segments
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        body = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:
            _parse_dqt(body, qts)
        elif marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):
            raise ValueError("JPEG declares a second SOF segment")
        elif marker == 0xDA:
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            scomps, ss, se, ah, al = _parse_sos_multi(
                body, comps, huff, progressive
            )
            i = _decode_scan_into(
                b, i + 2 + seg_len, store, scomps, comps, ss, se, ah, al,
                w, h, hmax, vmax, mcus_x, mcus_y, huff, restart_interval,
                progressive, precision,
            )
            continue
        i += 2 + seg_len
    planes = _idct_planes(store, comps, qts, precision)
    return _finish_rgb(planes, comps, w, h, hmax, vmax)


def _encode_blocks(plane: "np.ndarray", qt: "np.ndarray") -> "np.ndarray":
    """(H, W) float plane (level-shifted) → (n_blocks_y, n_blocks_x, 64)
    quantized zigzag coefficients, vectorized DCT over all blocks."""
    H, W = plane.shape
    blocks = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,abxy,vy->abuv", _DCT_A, blocks, _DCT_A)
    # half-away-from-zero rounding, symmetric for both signs
    q = np.where(
        f >= 0, np.floor(f / qt + 0.5), -np.floor(-f / qt + 0.5)
    ).astype(np.int32)
    return q.reshape(H // 8, W // 8, 64)


def _zigzag_block(q64: "np.ndarray") -> "np.ndarray":
    out = np.empty(64, np.int32)
    out[:] = q64[ZIGZAG]
    return out


def _bit_size(v: int) -> int:
    return int(abs(v)).bit_length()


def _prepare_planes(arr, luma_qt, chroma_qt, subsample):
    """RGB → padded YCbCr plane specs + quantized coefficient arrays —
    the shared front half of the sequential and progressive encoders."""
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    def pad(p, mult):
        ph = -(-p.shape[0] // mult) * mult
        pw = -(-p.shape[1] // mult) * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    if subsample:
        y_p = pad(y, 16)
        cbp = pad(cb, 16)
        crp = pad(cr, 16)
        cb_s = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr_s = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        plane_specs = [(y_p, 2, 2, 0), (cb_s, 1, 1, 1), (cr_s, 1, 1, 1)]
    else:
        plane_specs = [(pad(y, 8), 1, 1, 0), (pad(cb, 8), 1, 1, 1), (pad(cr, 8), 1, 1, 1)]

    qts = [luma_qt, chroma_qt]
    coeffs = [
        _encode_blocks(p - 128.0, qts[qid]) for p, _hs, _vs, qid in plane_specs
    ]
    return plane_specs, coeffs


def jpeg_encode(
    arr: "np.ndarray",
    luma_qt: "np.ndarray" = STD_LUMA_QT,
    chroma_qt: "np.ndarray" = STD_CHROMA_QT,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline sequential JFIF bytes. 4:4:4 by
    default; ``subsample=True`` emits 4:2:0 (2x2 mean chroma).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs. Pass all-ones tables for a near-lossless round-trip."""
    h, w = arr.shape[:2]
    plane_specs, coeffs = _prepare_planes(arr, luma_qt, chroma_qt, subsample)
    qts = [luma_qt, chroma_qt]

    dc_codes = _canonical_codes(_ENC_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _AC_SYMBOLS)
    writer = _BitWriter()
    hmax = max(hs for _p, hs, _vs, _q in plane_specs)
    vmax = max(vs for _p, _hs, vs, _q in plane_specs)
    mcus_x = plane_specs[0][0].shape[1] // (8 * hmax)
    mcus_y = plane_specs[0][0].shape[0] // (8 * vmax)
    preds = [0, 0, 0]
    entropy_segments: list[bytes] = []
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                entropy_segments.append(writer.flush())
                writer = _BitWriter()
                preds = [0, 0, 0]
            for ci, (_p, hs, vs, _q) in enumerate(plane_specs):
                for by in range(vs):
                    for bx in range(hs):
                        zz = _zigzag_block(coeffs[ci][my * vs + by, mx * hs + bx])
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        size = _bit_size(diff)
                        code, length = dc_codes[size]
                        writer.write(code, length)
                        if size:
                            writer.write(
                                diff if diff > 0 else diff + (1 << size) - 1, size
                            )
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                if k > last_nz:
                                    code, length = ac_codes[0x00]  # EOB
                                    writer.write(code, length)
                                    break
                                run += 1
                                continue
                            while run > 15:
                                code, length = ac_codes[0xF0]  # ZRL
                                writer.write(code, length)
                                run -= 16
                            size = _bit_size(v)
                            code, length = ac_codes[(run << 4) | size]
                            writer.write(code, length)
                            writer.write(v if v > 0 else v + (1 << size) - 1, size)
                            run = 0
            mcu_index += 1
    entropy_segments.append(writer.flush())

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    for tid, qt in enumerate(qts):
        zz = np.asarray(qt).reshape(64)[ZIGZAG]
        seg(0xDB, bytes([tid]) + bytes(int(v) for v in zz))
    samp = (0x22, 0x11, 0x11) if subsample else (0x11, 0x11, 0x11)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid in range(3):
        sof += bytes([cid + 1, samp[cid], 0 if cid == 0 else 1])
    seg(0xC0, sof)
    # one DC + one AC table, referenced by every component — the fixed
    # set covers all symbols, so per-channel copies would be redundant
    for tclass, bits, symbols in (
        (0, _ENC_DC_BITS, _DC_SYMBOLS),
        (1, _ENC_AC_BITS, _AC_SYMBOLS),
    ):
        seg(0xC4, bytes([tclass << 4]) + bytes(bits) + bytes(symbols))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid in range(3):
        sos += bytes([cid + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    for si, segment in enumerate(entropy_segments):
        out.extend(segment)
        if si < len(entropy_segments) - 1:
            out.extend(bytes([0xFF, 0xD0 + (si % 8)]))
    out.extend(b"\xff\xd9")
    return bytes(out)


# Progressive AC alphabet: the (run, size) set plus ZRL plus the EOBn
# symbols (n = 0..14) progressive EOB-run coding needs — 176 symbols at
# 8 bits each (Kraft-feasible, all-ones code unused).
_PROG_AC_SYMBOLS = (
    [n << 4 for n in range(15)]
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]

# The conventional ten-scan schedule (DC first at Al=1; luma low band,
# full chroma bands, luma high band; then one refinement pass per
# band): each entry is (component_indices, Ss, Se, Ah, Al).
_DEFAULT_PROG_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
)


def jpeg_encode_progressive(
    arr: "np.ndarray",
    luma_qt: "np.ndarray" = STD_LUMA_QT,
    chroma_qt: "np.ndarray" = STD_CHROMA_QT,
    subsample: bool = False,
    restart_interval: int = 0,
    scans: tuple = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes over the same
    quantized coefficients :func:`jpeg_encode` produces (T.81 §G.1.2:
    spectral selection + successive approximation, EOB-run coding,
    refinement correction bits). ``scans`` overrides the default
    schedule with ``(component_indices, Ss, Se, Ah, Al)`` tuples; every
    refinement must step its band's Al down by exactly one."""
    h, w = arr.shape[:2]
    plane_specs, coeffs = _prepare_planes(arr, luma_qt, chroma_qt, subsample)
    qts = [luma_qt, chroma_qt]
    zz = [c[:, :, ZIGZAG] for c in coeffs]
    if scans is None:
        scans = _DEFAULT_PROG_SCANS
    first_coded: dict = {}  # (component, zigzag coefficient) -> current Al
    for ids, ss, se, ah, al in scans:
        bad_ids = [ci for ci in ids if not 0 <= ci < len(zz)]
        if bad_ids or len(set(ids)) != len(ids):
            raise ValueError(
                f"scan component ids {tuple(ids)} must be distinct indices "
                f"in 0..{len(zz) - 1}"
            )
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(ids) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (0 <= ss <= se <= 63) or not 0 <= al <= 13:
            raise ValueError(f"scan band Ss={ss}..Se={se}/Al={al} out of range")
        if ah and ah != al + 1:
            # a refinement transmits exactly one magnitude bit per
            # coefficient, which only reconstructs when Ah == Al + 1
            raise ValueError(f"refinement scan must have Ah=Al+1 (got {ah}/{al})")
        # T.81 §G.1.1.1 successive-approximation sequencing, tracked per
        # (component, zigzag coefficient): each cell is FIRST-coded (Ah=0)
        # exactly once, and every refinement must find the cell at exactly
        # level Ah (one magnitude bit per scan, no skips, no refining a
        # band that was never first-coded) — any violation would silently
        # emit a stream the decoder rejects as corrupt.
        cells = [(ci, k) for ci in ids for k in range(ss, se + 1)]
        if ah == 0:
            dup = [c for c in cells if c in first_coded]
            if dup:
                ci, k = min(dup)
                raise ValueError(
                    f"coefficient {k} of component {ci} first-coded by two "
                    f"scans (band Ss={ss}..Se={se} overlaps an earlier Ah=0 "
                    "scan)"
                )
            for c in cells:
                first_coded[c] = al
        else:
            for ci, k in cells:
                cur = first_coded.get((ci, k))
                if cur != ah:
                    raise ValueError(
                        f"refinement scan Ah={ah}->Al={al} over coefficient "
                        f"{k} of component {ci} "
                        + (
                            "that was never first-coded"
                            if cur is None
                            else f"currently at Al={cur} — refinements must "
                            "step down one bit at a time"
                        )
                    )
                first_coded[(ci, k)] = al
    hmax = max(hs for _p, hs, _vs, _q in plane_specs)
    vmax = max(vs for _p, _hs, vs, _q in plane_specs)
    mcus_x = plane_specs[0][0].shape[1] // (8 * hmax)
    mcus_y = plane_specs[0][0].shape[0] // (8 * vmax)
    comps_geo = [{"h": hs, "v": vs} for _p, hs, vs, _q in plane_specs]
    dc_codes = _canonical_codes(_ENC_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_ENC_AC_BITS_PROG, _PROG_AC_SYMBOLS)

    scan_payloads: list[bytes] = []
    for ids, ss, se, ah, al in scans:
        writer = _BitWriter()
        preds = {ci: 0 for ci in ids}
        eobrun = 0
        pending: list[int] = []  # correction bits owed to the next EOBn
        segments: list[bytes] = []

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            n_ = eobrun.bit_length() - 1
            code, ln = ac_codes[n_ << 4]
            writer.write(code, ln)
            if n_:
                writer.write(eobrun - (1 << n_), n_)
            for bit in pending:
                writer.write(bit, 1)
            pending.clear()
            eobrun = 0

        def ac_first(band):
            nonlocal eobrun
            tvals = [
                (abs(v) >> al) * (1 if v > 0 else -1) for v in band
            ]
            nz = [i for i, v in enumerate(tvals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                return
            flush_eob()
            pos = 0
            for i in nz:
                run = i - pos
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    writer.write(code, ln)
                    run -= 16
                v = tvals[i]
                size = _bit_size(v)
                code, ln = ac_codes[(run << 4) | size]
                writer.write(code, ln)
                writer.write(v if v > 0 else v + (1 << size) - 1, size)
                pos = i + 1
            if pos < len(tvals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()

        def ac_refine(band):
            nonlocal eobrun
            hist = [(abs(v) >> ah) != 0 for v in band]
            corr = [(abs(v) >> al) & 1 for v in band]
            news = [
                i for i, v in enumerate(band)
                if not hist[i] and (abs(v) >> al)
            ]
            L = len(band)
            if not news:
                eobrun += 1
                pending.extend(corr[i] for i in range(L) if hist[i])
                if eobrun == 0x7FFF:
                    flush_eob()
                return
            flush_eob()
            pos = 0
            for i in news:
                zeros = sum(1 for j in range(pos, i) if not hist[j])
                while zeros > 15:
                    code, ln = ac_codes[0xF0]
                    writer.write(code, ln)
                    cnt = 0
                    # the 16 skipped zero-history slots carry their
                    # neighbours' correction bits inline, decoder-order
                    while cnt < 16:
                        if hist[pos]:
                            writer.write(corr[pos], 1)
                        else:
                            cnt += 1
                        pos += 1
                    zeros -= 16
                code, ln = ac_codes[(zeros << 4) | 1]
                writer.write(code, ln)
                writer.write(1 if band[i] > 0 else 0, 1)
                for j in range(pos, i):
                    if hist[j]:
                        writer.write(corr[j], 1)
                pos = i + 1
            if pos < L:
                eobrun += 1
                pending.extend(corr[j] for j in range(pos, L) if hist[j])
                if eobrun == 0x7FFF:
                    flush_eob()

        scomps = [(ci, 0, 0) for ci in ids]
        ui = 0
        for unit in _scan_units(
            scomps, comps_geo, w, h, hmax, vmax, mcus_x, mcus_y
        ):
            if restart_interval and ui and ui % restart_interval == 0:
                flush_eob()
                segments.append(writer.flush())
                writer = _BitWriter()
                preds = {ci: 0 for ci in ids}
            for ci, r, cl, _d, _a in unit:
                blk = zz[ci][r, cl]
                if ss == 0 and ah == 0:  # DC first
                    v = int(blk[0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    size = _bit_size(diff)
                    code, ln = dc_codes[size]
                    writer.write(code, ln)
                    if size:
                        writer.write(
                            diff if diff > 0 else diff + (1 << size) - 1, size
                        )
                elif ss == 0:  # DC refinement: one raw bit per block
                    writer.write((int(blk[0]) >> al) & 1, 1)
                elif ah == 0:
                    ac_first([int(v) for v in blk[ss : se + 1]])
                else:
                    ac_refine([int(v) for v in blk[ss : se + 1]])
            ui += 1
        flush_eob()
        segments.append(writer.flush())
        payload = bytearray()
        for si, segment in enumerate(segments):
            payload.extend(segment)
            if si < len(segments) - 1:
                payload.extend(bytes([0xFF, 0xD0 + (si % 8)]))
        scan_payloads.append(bytes(payload))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    for tid, qt in enumerate(qts):
        zzq = np.asarray(qt).reshape(64)[ZIGZAG]
        seg(0xDB, bytes([tid]) + bytes(int(v) for v in zzq))
    samp = (0x22, 0x11, 0x11) if subsample else (0x11, 0x11, 0x11)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid in range(3):
        sof += bytes([cid + 1, samp[cid], 0 if cid == 0 else 1])
    seg(0xC2, sof)
    for tclass, bits, symbols in (
        (0, _ENC_DC_BITS, _DC_SYMBOLS),
        (1, _ENC_AC_BITS_PROG, _PROG_AC_SYMBOLS),
    ):
        seg(0xC4, bytes([tclass << 4]) + bytes(bits) + bytes(symbols))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    for (ids, ss, se, ah, al), payload in zip(scans, scan_payloads):
        sos = bytes([len(ids)])
        for ci in ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        out.extend(payload)
    out.extend(b"\xff\xd9")
    return bytes(out)
