"""Baseline JPEG codec in pure numpy — closes the last compressed-image
gap without an imaging library (the PNG sibling lives in multimodal.py).

Implemented from the public JPEG specification (ITU-T T.81 / ISO 10918-1):
- encode_jpeg: baseline sequential DCT, 8-bit, grayscale or YCbCr
  (BT.601), 4:4:4 by default with optional 4:2:0 chroma subsampling,
  standard Annex K quantization (quality-scaled, IJG curve) and Huffman
  tables, JFIF APP0 header.
- decode_jpeg: baseline sequential only (SOF0), 8-bit, 1- or 3-component,
  any sampling factors up to 2×2 (covers 4:4:4 / 4:2:2 / 4:2:0), restart
  markers, multiple DQT/DHT segments. Progressive (SOF2), arithmetic
  coding and 12-bit refuse with ValueError so callers fall through to the
  imaging-library probe.

The DCT is exact float64 matrix algebra (D = C·B·Cᵀ with the orthonormal
DCT-II basis), so encode→decode error is bounded by quantization alone —
the property the tests pin analytically (a solid-color block quantizes
exactly: DC-only, zero error).

Scale note: this codec runs inside mapInPandas batches exactly like the
PPM/BMP/PNG paths (operators/multimodal.decode_images) — per-partition
Arrow batches, no driver involvement. Throughput is numpy-bound; a real
deployment with Pillow installed takes the imaging-library branch, which
the probe prefers for formats this codec refuses.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constants from the spec (Annex K)

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

#: Annex K luminance / chrominance quantization tables (quality 50 base).
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Standard Huffman tables (Annex K.3): (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: Orthonormal DCT-II basis: forward D = C @ B @ C.T, inverse B = C.T @ D @ C.
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 = Annex K as-is; clamp entries to [1, 255]."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code generation: value -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(
    bw: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc_tbl: dict,
    ac_tbl: dict,
) -> int:
    """Huffman-encode one quantized zigzag block; returns the new DC pred."""
    dc = int(coefs[0])
    cat, bits = _magnitude(dc - pred)
    code, ln = dc_tbl[cat]
    bw.write(code, ln)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coefs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coefs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last_nz != 63:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _fdct_quant(plane: np.ndarray, qtbl64: np.ndarray) -> np.ndarray:
    """(H, W) float64 level-shifted plane → (H//8 * W//8, 64) quantized
    zigzag blocks (vectorized: all blocks DCT'd with two matmuls)."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    d = np.einsum("ux,bcxy,vy->bcuv", _C, blocks, _C, optimize=True)
    q = np.round(d / qtbl64.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF JPEG.
    ``subsample``: False → 4:4:4 (default), True or "420" → 4:2:0 chroma
    (the common camera layout, Y sampled 2×2), "422" → 4:2:2 (Y sampled
    2×1, the broadcast/DV layout — chroma halved horizontally only).
    The decoder's MCU walk is generic over per-component sampling factors,
    so all three layouts round-trip through `decode_jpeg` with no special
    casing there. ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that many MCUs (what camera firmware writes for
    error resilience — exercises the decoder's restart path)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsample not in (False, True, "420", "422"):
        # Fail fast for ANY unrecognized value (strings, ints like 422,
        # bytes): every other truthy value would fall into the 4:2:0
        # branch and silently emit the wrong layout.
        raise ValueError(
            f"unknown chroma subsampling {subsample!r}: use False, True/'420', or '422'"
        )
    ql = _quality_scale(QTBL_LUMA, quality)
    qc = _quality_scale(QTBL_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "422":
            # Horizontal-only 2×1 box average; pad width to even first.
            pe_w = (w + 1) // 2 * 2
            def sub(p):
                pp = np.pad(p, ((0, 0), (0, pe_w - w)), mode="edge")
                return pp.reshape(h, pe_w // 2, 2).mean(axis=2)
            planes = [y - 128.0, sub(cb) - 128.0, sub(cr) - 128.0]
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            # 4:2:0 — 2×2 box average; pad to even first.
            pe_h, pe_w = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def sub(p):
                pp = np.pad(p, ((0, pe_h - h), (0, pe_w - w)), mode="edge")
                return (
                    pp.reshape(pe_h // 2, 2, pe_w // 2, 2).mean(axis=(1, 3))
                )
            planes = [y - 128.0, sub(cb) - 128.0, sub(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # Pad each plane to a whole number of MCUs for its sampling factor.
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(
            np.pad(
                p,
                ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                mode="edge",
            )
        )

    qtbls = [ql.astype(np.float64), qc.astype(np.float64)]
    blocks = [
        _fdct_quant(p, qtbls[qsel[i]]) for i, p in enumerate(padded)
    ]
    bw = _BitWriter()
    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    preds = [0] * len(planes)
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        my, mx = divmod(mcu, mcux)
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(planes)
        for ci, (sh, sv) in enumerate(samp):
            bw_row = padded[ci].shape[1] // 8
            dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for by in range(sv):
                for bx in range(sh):
                    bi = (my * sv + by) * bw_row + (mx * sh + bx)
                    preds[ci] = _encode_block(
                        bw, blocks[ci][bi], preds[ci], dc_t, ac_t
                    )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += seg(0xFFC0, sof)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        return self.read(1)

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decoder(bits: list[int], vals: list[int]):
    """-> dict[(length, code)] = value, plus max length, for bit-serial
    decode."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff_value(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise ValueError("corrupt Huffman stream")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w) grayscale or (h, w, 3) RGB."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtbl: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes (some camera firmware pads) — skip them.
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", b[pos : pos + 2])
        payload = b[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            p = 0
            while p < len(payload):
                pq, tid = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, np.int32)
                t[ZIGZAG] = np.frombuffer(
                    payload[p : p + 64], np.uint8
                ).astype(np.int32)
                qtbl[tid] = t
                p += 64
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _huff_decoder(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, sampb, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sampb >> 4, sampb & 0xF, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            scan = []
            for ci in range(ns):
                cid, tt = payload[1 + 2 * ci], payload[2 + 2 * ci]
                scan.append((cid, tt >> 4, tt & 0xF))
            fh, fw, comps = frame
            if ns != len(comps):
                # Non-interleaved (one SOS per component) is legal T.81
                # but this decoder only implements the interleaved MCU
                # walk — decoding just the first scan would silently
                # return a grayscale/garbled image; refuse into the
                # imaging-library fallback instead.
                raise ValueError(
                    "non-interleaved multi-scan baseline JPEG unsupported"
                )
            byid = {c[0]: c for c in comps}
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            out_planes = {}
            for cid, sh, sv, _tq in comps:
                out_planes[cid] = np.zeros(
                    (mcuy * 8 * sv, mcux * 8 * sh), np.float64
                )
            br = _BitReader(b, pos + ln)
            preds = {cid: 0 for cid, *_ in comps}
            n_mcu = mcux * mcuy
            mcu = 0
            while mcu < n_mcu:
                try:
                    my, mx = divmod(mcu, mcux)
                    for cid, td, ta in scan:
                        _, sh, sv, tq = byid[cid]
                        for by in range(sv):
                            for bx in range(sh):
                                coefs = np.zeros(64, np.int32)
                                cat = _read_huff_value(br, huff[(0, td)])
                                diff = _extend(br.read(cat), cat) if cat else 0
                                preds[cid] += diff
                                coefs[0] = preds[cid]
                                k = 1
                                while k <= 63:
                                    rs = _read_huff_value(br, huff[(1, ta)])
                                    r, s = rs >> 4, rs & 0xF
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError("AC index overflow")
                                    coefs[k] = _extend(br.read(s), s)
                                    k += 1
                                # coefs is zigzag-ordered; align the quant
                                # table to the same order before scaling.
                                dq = (coefs * qtbl[tq][ZIGZAG]).astype(
                                    np.float64
                                )
                                blk = np.zeros(64)
                                blk[ZIGZAG] = dq
                                spat = _C.T @ blk.reshape(8, 8) @ _C
                                y0 = (my * sv + by) * 8
                                x0 = (mx * sh + bx) * 8
                                out_planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spat
                    mcu += 1
                    if restart_interval and mcu % restart_interval == 0 and mcu < n_mcu:
                        br.align_to_marker()
                        # consume the RSTn marker
                        while br.data[br.pos] != 0xFF:
                            br.pos += 1
                        br.pos += 2
                        preds = {cid: 0 for cid, *_ in comps}
                except _RestartMarker:
                    br.pos += 2  # past the FF Dn marker pair
                    br.align_to_marker()
                    preds = {cid: 0 for cid, *_ in comps}

            planes = []
            for cid, sh, sv, _tq in comps:
                p = out_planes[cid] + 128.0
                # Upsample to full resolution (nearest) then crop.
                ry, rx = vmax // sv, hmax // sh
                if ry > 1 or rx > 1:
                    p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
                planes.append(p[:fh, :fw])
            if len(planes) == 1:
                return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            bl = y + 1.772 * cb
            rgb = np.stack([r, g, bl], axis=-1)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        pos += ln
    raise ValueError("no scan data found")
