"""Baseline JPEG (SOF0) codec + the jpeg media operators — pure
stdlib/numpy, closing the last honestly-stubbed image-codec seam in
:mod:`pulseboard_spark.operators.multimodal`.

What is REAL here: the full baseline machinery — FDCT/quantize/zigzag,
canonical Huffman coding with the JPEG-spec Annex K luminance AND
chrominance tables, DC differential prediction, AC run-length/EOB
coding, 0xFF byte stuffing/unstuffing, multi-table DQT/DHT parsing,
interleaved-MCU scan decode with per-component sampling factors, chroma
upsampling, and the JFIF/BT.601 YCbCr color transform — runs generally
on arbitrary 8-bit grayscale (1-component) and color (3-component
4:4:4 / 4:2:2 / 4:2:0) input, both directions
(:func:`encode_jpeg_gray`/:func:`encode_jpeg_color` →
:func:`decode_jpeg`), plus DRI/RSTm restart intervals and both
baseline scan layouts (one interleaved scan, or per-component
non-interleaved scans) in both directions.  Remaining scope boundaries
raise NotImplementedError: progressive, 12-bit, sampling factors
above 2.

What makes it ORACLE-CHECKABLE: JPEG is lossy, but for an image whose
8x8 blocks are each a constant EVEN value and a quant table whose DC
step is 16, the round trip is bit-exact — FDCT of a constant block is a
pure DC of 8*(c-128) with all AC mathematically zero, and
8*(c-128)/16 = (c-128)/2 is an exact integer, so quantize/dequantize
loses nothing and the IDCT returns exactly c.  :func:`synth_jpeg`
generates that family (pixels closed-form in doc_id), so the DuckDB
oracle reproduces every decoded statistic arithmetically while the
decoder does the full general entropy-decode work.  The general lossy
path (nonzero AC, rounding, stuffing) is pinned by
``tests/test_operators.py::TestJpegCodec`` instead.

100 TB posture: same as every decode stage here — one Arrow-batched
``mapInPandas`` pass, payloads never shuffle, per-object Python is
inherent to an entropy-coded codec, parallelism = input partitions.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

#: The malformed-payload exception contract every in-repo codec honors
#: (this module's fuzz pin plus the multimodal PNG/PPM/WAV/PBV decoders):
#: a corrupt or out-of-scope payload raises one of exactly these — never
#: IndexError / struct.error / zlib.error / OverflowError.  Feature
#: operators catch this tuple per object and QUARANTINE the row
#: (``decoded=false``, NULL features) instead of failing the stage — the
#: media twin of P1's dead-letter routing (operators/identity.py:26-42):
#: on a 100 TB corpus one corrupt payload must cost one row, not the job.
MEDIA_DECODE_ERRORS = (ValueError, EOFError, NotImplementedError)

# --- tables (JPEG spec ITU-T T.81 Annex K — public constants) ---------------

#: zigzag index of each raster position (row-major 8x8 -> zigzag order)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: quant table: DC step 16 (the exactness contract for even constant
#: blocks), AC steps 16 throughout — legal, and keeps the lossy-path
#: error small for the pytest bound.
QTABLE = np.full(64, 16, dtype=np.int64)

# Annex K luminance DC: 16 length counts + value list (categories 0-11)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K luminance AC: 16 length counts + 162 (run,size) symbols
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Annex K chrominance DC: 16 length counts + value list (categories 0-11)
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))

# Annex K chrominance AC: 16 length counts + 162 (run,size) symbols
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) for a canonical JPEG Huffman table."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes

_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)
_DC_ENC_C = _canonical_codes(DC_BITS_C, DC_VALS_C)
_AC_ENC_C = _canonical_codes(AC_BITS_C, AC_VALS_C)
# decode maps: (length, code) -> symbol
_DC_DEC = {(l, c): s for s, (c, l) in _DC_ENC.items()}
_AC_DEC = {(l, c): s for s, (c, l) in _AC_ENC.items()}

# DCT basis: C[u, x] = 0.5 * a(u) * cos((2x+1) u pi / 16); S = C s C^T
_C = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """1-pad to a byte boundary and emit RSTm — marker bytes are NOT
        byte-stuffed (T.81 B.2.1: markers are the one legal 0xFF pair
        inside entropy-coded data)."""
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        self.out.append(0xFF)
        self.out.append(0xD0 + (m & 7))


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise EOFError("entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy data")
            self.pos += 1  # skip the stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart_sync(self) -> int:
        """Discard pad bits, consume the RSTm marker at the current byte
        position, and return m (0-7).  Raises if the stream is not at a
        restart marker — a desync here means lost MCUs, never silence."""
        self.acc, self.n = 0, 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("RST marker expected in entropy data")
        while self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # spec-legal fill bytes
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("RST marker expected in entropy data")
        self.pos += 2
        return m & 7


def _extend(v: int, size: int) -> int:
    """Undo JPEG magnitude coding: v in [0, 2^size) -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (size, raw bits)."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _encode_block(writer: _BitWriter, q: "np.ndarray", pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    """Emit one quantized zigzag block (DC differential prediction, AC run-length,
    ZRL/EOB) with the given canonical tables; returns the new DC
    predictor.  Shared by the grayscale and color encoders."""
    dc, diff = int(q[0]), int(q[0]) - pred
    size, raw = _magnitude(diff)
    code, length = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(raw, size)
    run = 0
    last_nz = int(np.nonzero(q[1:])[0].max()) + 1 if np.any(q[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        size, raw = _magnitude(v)
        code, length = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(raw, size)
        run = 0
    if last_nz < 63:
        ec, el = ac_enc[0x00]  # EOB
        writer.write(ec, el)
    return dc


def encode_jpeg_gray(width: int, height: int, gray: bytes,
                     restart_interval: int = 0) -> bytes:
    """Real baseline JPEG: 8-bit grayscale, Annex K Huffman tables, DC
    step 16.  Dimensions not multiples of 8 are edge-replicated to the
    block grid (standard practice); the decoder crops back.  With
    ``restart_interval=n`` a DRI segment is written and RSTm markers
    reset the DC predictor every n MCUs (one MCU = one block here);
    the default 0 emits byte-identical streams to earlier rounds."""
    if len(gray) != width * height:
        raise ValueError(
            f"pixel buffer is {len(gray)} bytes; expected width*height = {width * height}"
        )
    img = np.frombuffer(gray, dtype=np.uint8).reshape(height, width).astype(np.float64)
    bw, bh = -(-width // 8), -(-height // 8)
    img = np.pad(img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")

    qt = QTABLE.reshape(8, 8).astype(np.float64)
    writer = _BitWriter()
    pred = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart((mcu // restart_interval - 1) % 8)
                pred = 0
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _C @ block @ _C.T
            # raster coefficients, emitted in zigzag order
            q = np.rint(coef / qt).astype(np.int64).ravel()[ZIGZAG]
            pred = _encode_block(writer, q, pred, _DC_ENC, _AC_ENC)
            mcu += 1

    dqt = bytes([0x00]) + bytes(int(QTABLE[ZIGZAG[i]]) for i in range(64))
    # SOF carries the TRUE dimensions; block padding is encoder-internal
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + _seg(0xFFDB, dqt)
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht)
        + dri
        + _seg(0xFFDA, sos)
        + writer.flush()
        + b"\xff\xd9"
    )


#: subsampling name -> luma sampling factors (h, v); chroma is always 1x1
_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _rgb_to_ycbcr(rgb: "np.ndarray") -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """JFIF / BT.601 full-range forward transform (float planes)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_to(plane: "np.ndarray", rows: int, cols: int) -> "np.ndarray":
    return np.pad(plane, ((0, rows - plane.shape[0]), (0, cols - plane.shape[1])),
                  mode="edge")


def encode_jpeg_color(width: int, height: int, rgb: bytes,
                      subsampling: str = "4:2:0",
                      restart_interval: int = 0,
                      interleaved: bool = True) -> bytes:
    """Real baseline color JPEG: YCbCr (JFIF/BT.601), Annex K luma AND
    chroma Huffman tables (ids 0/1), two quant tables (flat 16), with
    4:4:4 / 4:2:2 / 4:2:0 chroma subsampling (box-mean downsample).
    ``interleaved=True`` (the common layout) writes one scan of MCUs;
    ``interleaved=False`` writes three non-interleaved scans (one per
    component, block raster over each component's own grid — the other
    spec-legal baseline layout, emitted by some encoders).
    ``restart_interval=n`` writes DRI + RSTm every n MCUs (interleaved)
    or every n blocks per scan (non-interleaved).  The decoder side is
    :func:`decode_jpeg`."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(rgb)} bytes; expected width*height*3 = {width * height * 3}"
        )
    hl, vl = _SUBSAMPLING[subsampling]
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    y, cb, cr = _rgb_to_ycbcr(img)

    # MCU grid from the luma sampling factors
    mx, my = -(-width // (8 * hl)), -(-height // (8 * vl))
    y_p = _pad_to(y, my * vl * 8, mx * hl * 8)
    # chroma: pad to the downsample multiple, box-mean, then pad to 8x8 grid
    cpl = []
    for c in (cb, cr):
        c = _pad_to(c, -(-height // vl) * vl, -(-width // hl) * hl)
        if hl > 1 or vl > 1:
            c = c.reshape(c.shape[0] // vl, vl, c.shape[1] // hl, hl).mean(axis=(1, 3))
        cpl.append(_pad_to(c, my * 8, mx * 8))
    qt = QTABLE.reshape(8, 8).astype(np.float64)

    writer = _BitWriter()
    preds = [0, 0, 0]

    def emit(plane, by, bx, ci):
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = _C @ block @ _C.T
        q = np.rint(coef / qt).astype(np.int64).ravel()[ZIGZAG]
        dc_e, ac_e = (_DC_ENC, _AC_ENC) if ci == 0 else (_DC_ENC_C, _AC_ENC_C)
        preds[ci] = _encode_block(writer, q, preds[ci], dc_e, ac_e)

    scan_bytes = b""
    if interleaved:
        mcu = 0
        for myi in range(my):
            for mxi in range(mx):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    writer.restart((mcu // restart_interval - 1) % 8)
                    preds[0] = preds[1] = preds[2] = 0
                for byy in range(vl):           # luma: vl x hl blocks per MCU
                    for bxx in range(hl):
                        emit(y_p, myi * vl + byy, mxi * hl + bxx, 0)
                emit(cpl[0], myi, mxi, 1)       # Cb: one block per MCU
                emit(cpl[1], myi, mxi, 2)       # Cr
                mcu += 1
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        scan_bytes = _seg(0xFFDA, sos) + writer.flush()
    else:
        # three non-interleaved scans over each component's OWN block grid
        cw, ch = -(-width // hl), -(-height // vl)       # chroma sample dims
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        grids = [
            (y_p, 0, -(-width // 8), -(-height // 8), bytes([1, 1, 0x00, 0, 63, 0])),
            (cpl[0], 1, cbw, cbh, bytes([1, 2, 0x11, 0, 63, 0])),
            (cpl[1], 2, cbw, cbh, bytes([1, 3, 0x11, 0, 63, 0])),
        ]
        for plane, ci, cbw, cbh, sos in grids:
            writer = _BitWriter()
            preds[ci] = 0
            unit = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        writer.restart((unit // restart_interval - 1) % 8)
                        preds[ci] = 0
                    unit += 1
                    emit(plane, by, bx, ci)
            scan_bytes += _seg(0xFFDA, sos) + writer.flush()

    flat16 = bytes(int(QTABLE[ZIGZAG[i]]) for i in range(64))
    dqt = bytes([0x00]) + flat16 + bytes([0x01]) + flat16
    sof = (
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (hl << 4) | vl, 0])     # Y: luma sampling, qt 0
        + bytes([2, 0x11, 1])               # Cb
        + bytes([3, 0x11, 1])               # Cr
    )
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
        + bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C)
        + bytes([0x11]) + bytes(AC_BITS_C) + bytes(AC_VALS_C)
    )
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + _seg(0xFFDB, dqt)
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht)
        + dri
        + scan_bytes
        + b"\xff\xd9"
    )


def _parse_segments(payload: bytes):
    """Marker-segment parse for the supported baseline scope: multi-table
    DQT/DHT (keyed by id), SOF0 with 1 or 3 components and sampling
    factors ≤ 2, DRI, one or more SOS segments (each scan's entropy data
    bounded by the next true marker).  Raises NotImplementedError at
    every honest scope boundary (progressive, 12-bit, >3 components,
    sampling > 2)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    width = height = None
    scans: list = []
    ri = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            raise ValueError("truncated stream at marker boundary")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            # TEM / stray RSTn are standalone (no length field) — reading a
            # length here would silently desynchronize the parse
            raise NotImplementedError("standalone marker outside entropy data unsupported")
        if marker == 0xFF00:
            raise ValueError("0xFF00 is not a marker outside entropy data")
        if pos + 4 > len(payload):
            raise ValueError("truncated marker segment header")
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if length < 2 or len(body) != length - 2:
            raise ValueError("truncated marker segment body")
        pos += 2 + length
        if marker == 0xFFDB:
            off = 0
            while off < len(body):  # one DQT segment may carry several tables
                if off + 65 > len(body):
                    raise ValueError("truncated DQT table")
                pq_tq = body[off]
                if pq_tq & 0xF0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                z = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(np.int64)
                t = np.empty(64, dtype=np.int64)
                t[ZIGZAG] = z  # stored zigzag -> raster
                qts[pq_tq & 0x0F] = t
                off += 65
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError("only baseline sequential (SOF0) is decoded here")
        elif marker == 0xFFC0:
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("truncated SOF0 segment")
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision is decoded here")
            if not width or not height or width * height > (1 << 28):
                raise ValueError("zero or implausibly large frame dimensions")
            if ncomp not in (1, 3):
                raise NotImplementedError("only 1- (gray) or 3-component (YCbCr) baseline")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hh, vv = hv >> 4, hv & 0x0F
                if ncomp == 1:
                    # single-component scans are non-interleaved: the MCU is
                    # one data unit and the declared factors don't scale
                    hh = vv = 1
                elif hh not in (1, 2) or vv not in (1, 2):
                    raise NotImplementedError("sampling factors above 2 unsupported")
                comps.append((cid, hh, vv, tq))
            if len({c[0] for c in comps}) != ncomp:
                # duplicate ids would let a scan-coverage check keyed by id
                # pass while a plane is never written (r09 advisory)
                raise ValueError("duplicate component ids in SOF0")
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                if off + 17 > len(body):
                    raise ValueError("truncated DHT table")
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                if off + 17 + nvals > len(body):
                    raise ValueError("truncated DHT table values")
                vals = list(body[off + 17 : off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = {
                    (l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()
                }
                off += 17 + nvals
        elif marker == 0xFFDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            if not 1 <= ns <= 4:
                # Ns=0 would make every length check above vacuous and crash
                # component selection later (r09 advisory); >4 exceeds T.81
                raise ValueError("SOS component count outside 1..4")
            sel = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                   for i in range(ns)]
            # entropy data runs to the next true marker (0xFF followed by
            # anything but a stuffed 0x00 or an RSTn)
            end = pos
            while end < len(payload):
                nxt = payload.find(b"\xff", end)
                if nxt < 0:
                    raise ValueError("missing EOI marker")
                # T.81 B.1.1.2: runs of 0xFF fill bytes are legal before any
                # marker, including an in-scan RSTn (r09 advisory — a naive
                # 0xFF 0xFF read here truncated a spec-legal scan)
                k = nxt
                while k + 1 < len(payload) and payload[k + 1] == 0xFF:
                    k += 1
                if k + 1 >= len(payload):
                    raise ValueError("missing EOI marker")
                b2 = payload[k + 1]
                if b2 == 0x00 or 0xD0 <= b2 <= 0xD7:
                    end = k + 2
                    continue
                end = nxt
                break
            scans.append((sel, payload[pos:end], ri))
            pos = end
        # APPn/COM: skipped
    if not qts or width is None or not scans or comps is None or not huff:
        raise ValueError("missing DQT/SOF0/DHT/SOS segment")
    return qts, huff, comps, width, height, scans


def _read_symbol(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _decode_block(reader: _BitReader, dc_t: dict, ac_t: dict, pred: int):
    """Entropy-decode one block; returns (zigzag coefficients, new DC
    predictor)."""
    coef = np.zeros(64, dtype=np.int64)
    size = _read_symbol(reader, dc_t)
    if size > 15:
        raise ValueError("invalid DC magnitude category")
    pred += _extend(reader.bits(size), size)
    coef[0] = pred
    k = 1
    while k < 64:
        sym = _read_symbol(reader, ac_t)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        s = sym & 0x0F
        if k > 63:
            raise ValueError("AC run-length overflows the block")
        coef[k] = _extend(reader.bits(s), s)
        k += 1
    return coef, pred


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """General baseline decoder: parse, entropy-decode the interleaved
    scan (per-component Huffman/quant tables, sampling factors ≤ 2),
    dequantize, IDCT, upsample chroma, color-convert.

    Returns ``(width, height, n_channels, pixels)`` — grayscale bytes
    for 1-component streams, interleaved RGB (JFIF/BT.601 inverse) for
    3-component YCbCr.  Both scan layouts are decoded: one interleaved
    scan, or multiple non-interleaved scans (one component each, block
    order over the component's own grid).  Restart intervals (DRI/RSTm)
    are honored per scan: DC predictors reset and the bit stream
    re-syncs at every marker, with the modulo-8 restart count verified.
    Progressive / 12-bit / >2 sampling streams raise
    NotImplementedError — the honest remaining seam."""
    qts, huff, comps, width, height, scans = _parse_segments(payload)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx, my = -(-width // (8 * hmax)), -(-height // (8 * vmax))
    # np.zeros, not np.empty: a coverage bug must surface as black pixels,
    # never as leaked heap contents on an attacker-input path (r09 advisory)
    planes = [np.zeros((my * vv * 8, mx * hh * 8), dtype=np.float64)
              for _, hh, vv, _ in comps]
    cindex = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    covered: set[int] = set()  # component INDEXES (ids are checked unique at parse)

    def idct_into(ci, coef, qt2, by, bx):
        block = np.empty(64, dtype=np.float64)
        block[ZIGZAG] = coef  # zigzag -> raster
        block = block.reshape(8, 8) * qt2
        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _C.T @ block @ _C + 128.0

    def check_restart(reader, unit, ri):
        m = reader.restart_sync()
        want = (unit // ri - 1) % 8
        if m != want:
            raise ValueError(f"restart marker out of order: RST{m}, expected RST{want}")

    for sel, data, ri in scans:
        for cs, td, ta in sel:
            if cs not in cindex:
                raise ValueError(f"scan selects undeclared component {cs}")
            if cindex[cs] in covered:
                raise NotImplementedError(
                    "component appears in more than one scan (progressive?)"
                )
            covered.add(cindex[cs])
            if comps[cindex[cs]][3] not in qts:
                raise ValueError(f"missing quant table for component {cs}")
            if (0, td) not in huff or (1, ta) not in huff:
                raise ValueError(f"missing Huffman table for component {cs}")
        reader = _BitReader(data)
        if len(sel) > 1:
            # interleaved: MCU grid from the frame's max sampling factors
            scomps = [(cindex[cs], td, ta) for cs, td, ta in sel]
            preds = {ci: 0 for ci, _, _ in scomps}
            mcu = 0
            for myi in range(my):
                for mxi in range(mx):
                    if ri and mcu and mcu % ri == 0:
                        check_restart(reader, mcu, ri)
                        preds = {ci: 0 for ci, _, _ in scomps}
                    mcu += 1
                    for ci, td, ta in scomps:
                        cid, hh, vv, tq = comps[ci]
                        qt2 = qts[tq].reshape(8, 8).astype(np.float64)
                        for byy in range(vv):
                            for bxx in range(hh):
                                coef, preds[ci] = _decode_block(
                                    reader, huff[(0, td)], huff[(1, ta)], preds[ci]
                                )
                                idct_into(ci, coef, qt2,
                                          myi * vv + byy, mxi * hh + bxx)
        else:
            # non-interleaved: one block per data unit, over the
            # component's OWN block grid (not the MCU-padded one)
            cs, td, ta = sel[0]
            ci = cindex[cs]
            cid, hh, vv, tq = comps[ci]
            qt2 = qts[tq].reshape(8, 8).astype(np.float64)
            cw = -(-width * hh // hmax)
            ch = -(-height * vv // vmax)
            cbw, cbh = -(-cw // 8), -(-ch // 8)
            pred = 0
            unit = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if ri and unit and unit % ri == 0:
                        check_restart(reader, unit, ri)
                        pred = 0
                    unit += 1
                    coef, pred = _decode_block(
                        reader, huff[(0, td)], huff[(1, ta)], pred
                    )
                    idct_into(ci, coef, qt2, by, bx)
    if covered != set(range(len(comps))):
        raise ValueError("scans do not cover every frame component")

    if len(comps) == 1:
        pix = np.clip(np.rint(planes[0][:height, :width]), 0, 255).astype(np.uint8)
        return width, height, 1, pix.tobytes()

    # upsample each plane to full resolution (factor replication), crop
    full = []
    for (cid, hh, vv, tq), p in zip(comps, planes):
        if vv < vmax:
            p = np.repeat(p, vmax // vv, axis=0)
        if hh < hmax:
            p = np.repeat(p, hmax // hh, axis=1)
        full.append(p[:height, :width])
    y, cb, cr = full  # component order as declared in SOF (Y, Cb, Cr)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Single-component facade over :func:`decode_jpeg` — the interface
    the oracle-checked `jpeg_features` path consumes.  A color stream
    here is a contract violation, not a silent luma extraction."""
    width, height, ncomp, pix = decode_jpeg(payload)
    if ncomp != 1:
        raise NotImplementedError(
            "decode_jpeg_gray expects a single-component stream; use decode_jpeg"
        )
    return width, height, pix


# --- operators ---------------------------------------------------------------


def synth_jpeg(documents: DataFrame) -> DataFrame:
    """Deterministic REAL JPEG table: doc d gets a 8*(1+d%3) x 8*(1+d%2)
    grayscale image whose 8x8 block (bx, by) is the constant EVEN value
    ``2*((d + bx + 7*by) % 128)`` — the family for which baseline JPEG
    with DC step 16 round-trips bit-exactly (module docstring), so the
    DuckDB oracle reproduces every decoded statistic from the block grid
    arithmetically while the decoder runs the full entropy pipeline."""
    return documents.select("doc_id").mapInPandas(
        _synth_jpeg_batches, schema="doc_id bigint, media_type string, payload binary"
    )


def _synth_jpeg_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        # to_numpy(): the plain-list columns below must align by POSITION,
        # not by whatever index this batch's Series carries
        out = {"doc_id": pdf["doc_id"].to_numpy(), "media_type": [], "payload": []}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
            img = np.empty((h, w), dtype=np.uint8)
            for by in range(h // 8):
                for bx in range(w // 8):
                    img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        2 * ((d + bx + 7 * by) % 128)
                    )
            out["media_type"].append("image/jpeg")
            out["payload"].append(encode_jpeg_gray(w, h, img.tobytes()))
        yield pd.DataFrame(out)


JPEG_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, n_pixels bigint, "
    "n_blocks bigint, sum_luma bigint, max_luma int, decoded boolean"
)


def decoded_jpeg_features(media: DataFrame) -> DataFrame:
    """REAL JPEG decode + integer luma statistics — the grayscale twin of
    :func:`multimodal.decoded_features`; one Arrow-batched pass, payloads
    never shuffle.

    Corrupt-payload posture: a payload that raises inside the codec's
    documented :data:`MEDIA_DECODE_ERRORS` contract is QUARANTINED — the
    row is emitted with ``decoded=false`` and NULL features, and the
    stage stays alive (count quarantined rows downstream with
    ``sum(decoded = false)``).  Anything outside the contract still
    propagates: an unexpected exception class is a codec bug, not a
    corpus fact, and must fail loudly."""
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        _jpeg_feature_batches, schema=JPEG_SCHEMA
    )


def synth_jpeg_features(documents: DataFrame) -> DataFrame:
    """Fused :func:`synth_jpeg` → :func:`decoded_jpeg_features`: the same
    two batch kernels composed inside ONE Arrow-batched ``mapInPandas``
    stage, so the synthesized payload bytes never cross the Python↔JVM
    boundary at all — only ``doc_id`` enters and the integer feature row
    leaves (guide §4: pass only the columns the function needs; §8: move
    heavy bytes as few times as possible — here zero).  Row-for-row
    identical to the chained form by construction (iterator composition of
    the identical kernels, pinned by ``TestJpegOperators`` equality)."""
    return documents.select("doc_id").mapInPandas(
        _synth_jpeg_feature_batches, schema=JPEG_SCHEMA
    )


def _synth_jpeg_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    return _jpeg_feature_batches(_synth_jpeg_batches(it))


def _jpeg_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {c: [] for c in ("doc_id", "media_type", "width", "height",
                               "n_pixels", "n_blocks", "sum_luma", "max_luma", "decoded")}
        for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
            out["doc_id"].append(int(doc_id))
            out["media_type"].append(mtype)
            try:
                w, h, gray = decode_jpeg_gray(bytes(payload))
            except MEDIA_DECODE_ERRORS:
                for c in ("width", "height", "n_pixels", "n_blocks",
                          "sum_luma", "max_luma"):
                    out[c].append(None)
                out["decoded"].append(False)
                continue
            px = np.frombuffer(gray, dtype=np.uint8).astype(np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["n_pixels"].append(w * h)
            out["n_blocks"].append(-(-w // 8) * -(-h // 8))
            out["sum_luma"].append(int(px.sum()))
            out["max_luma"].append(int(px.max()) if len(px) else 0)
            out["decoded"].append(True)
        yield pd.DataFrame(out)
