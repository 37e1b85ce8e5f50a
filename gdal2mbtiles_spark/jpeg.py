"""Deterministic pure-numpy baseline JPEG codec (K6).

Implements the subset of ITU-T T.81 the tile sink needs: baseline
sequential DCT, 8-bit samples, 4:4:4 (no chroma subsampling), JFIF
APP0, with the Annex-K-style quantization and Huffman tables written
explicitly into DQT/DHT segments — a JPEG file carries its own tables,
so any conformant decoder reads the output regardless of table choice.
Replaces round 1's deflate stand-in (the reference shells out to
libvips jpegsave, reference renderers.py:49-95; its bytes are
OS-dependent, ours are bit-identical on every executor, which is what
content-addressed tile dedup requires).

The decoder half supports exactly what the encoder emits and exists
for round-trip tests — this container has no system JPEG library.

Hot-path note: encode is vectorized per tile (one einsum DCT over all
blocks, vectorized quantize/zigzag); only the entropy coding is a
Python loop, and renderers run once per *distinct* tile hash
(post-dedup), so the cost is bounded by distinct images, not tiles.
"""

from __future__ import annotations

import math
import struct
from typing import Dict, Tuple

import numpy as np

# --- tables (ITU-T T.81 Annex K) ---------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF9, 0xFA]


def _build_codes(bits, vals) -> Dict[int, Tuple[int, int]]:
    """Canonical Huffman codes from a DHT (BITS, HUFFVAL) spec
    (T.81 Annex C code-assignment procedure)."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_L = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
_DC_C = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
_AC_L = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
_AC_C = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

# every (run, size) symbol the encoder can emit must have a code:
# runs 0-15 x sizes 1-10, plus EOB (0x00) and ZRL (0xF0)
for _t in (_AC_L, _AC_C):
    assert all(r * 16 + s in _t for r in range(16) for s in range(1, 11))
    assert 0x00 in _t and 0xF0 in _t
for _t in (_DC_L, _DC_C):
    assert all(s in _t for s in range(12))


def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1)]
        if s % 2 == 0:
            diag.reverse()   # even diagonals run bottom-left -> top
        order.extend(i * 8 + j for i, j in diag if i < 8 and j < 8)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = (math.sqrt(1.0 / 8) if _k == 0 else 0.5) \
            * math.cos((2 * _n + 1) * _k * math.pi / 16)


def scaled_quant_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """libjpeg-style linear quality scaling of the base tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out[0], out[1]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:       # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> Tuple[int, int]:
    """(category, appended bits) per T.81 F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(zz: np.ndarray, prev_dc: int, dc_codes, ac_codes,
                  bw: _BitWriter) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - prev_dc)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    bw.write(bits, size)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[run * 16 + size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]   # EOB
        bw.write(c, ln)
    return dc


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _dht_segment(tc_th: int, bits, vals) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _quantized_zigzag(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    blocks = _to_blocks(plane)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    return np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg_rgb(rgb: np.ndarray, quality: int = 85,
                    subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF bytes.

    subsampling: '444' (1 block per component per MCU) or '420' (2x2
    luma blocks + one box-averaged chroma block per 16x16 MCU — the
    majority real-world layout, round-4 VERDICT #3).

    Arbitrary dimensions: edge-replicated to a multiple of the MCU
    side (the declared SOF size keeps the true dimensions, per
    spec)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {rgb.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, "
                         f"not {subsampling!r}")
    mcu = 8 if subsampling == "444" else 16
    true_h, true_w = rgb.shape[:2]
    pad_h = (-true_h) % mcu
    pad_w = (-true_w) % mcu
    if pad_h or pad_w:
        rgb = np.pad(rgb, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    h, w = rgb.shape[:2]

    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    # JFIF YCbCr; Y level-shifted by -128 for the DCT
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    ql, qc = scaled_quant_tables(quality)
    bw = _BitWriter()
    if subsampling == "444":
        zz = [_quantized_zigzag(p, q)
              for p, q in ((y, ql), (cb, qc), (cr, qc))]
        codes = ((_DC_L, _AC_L), (_DC_C, _AC_C), (_DC_C, _AC_C))
        prev = [0, 0, 0]
        for m in range(zz[0].shape[0]):     # MCU = 1 block/component
            for ci, (dc_c, ac_c) in enumerate(codes):
                prev[ci] = _encode_block(zz[ci][m], prev[ci],
                                         dc_c, ac_c, bw)
        samp = (0x11, 0x11, 0x11)
    else:
        # 4:2:0 — chroma box-averaged 2x2; MCU = 4 Y + 1 Cb + 1 Cr
        cb2 = (cb[0::2, 0::2] + cb[0::2, 1::2]
               + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4.0
        cr2 = (cr[0::2, 0::2] + cr[0::2, 1::2]
               + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4.0
        zz_y = _quantized_zigzag(y, ql)
        zz_cb = _quantized_zigzag(cb2, qc)
        zz_cr = _quantized_zigzag(cr2, qc)
        w8 = w // 8
        prev = [0, 0, 0]
        n_my, n_mx = h // 16, w // 16
        for my in range(n_my):
            for mx in range(n_mx):
                for dy in range(2):
                    for dx in range(2):
                        bi = (2 * my + dy) * w8 + 2 * mx + dx
                        prev[0] = _encode_block(zz_y[bi], prev[0],
                                                _DC_L, _AC_L, bw)
                ci = my * n_mx + mx
                prev[1] = _encode_block(zz_cb[ci], prev[1],
                                        _DC_C, _AC_C, bw)
                prev[2] = _encode_block(zz_cr[ci], prev[2],
                                        _DC_C, _AC_C, bw)
        samp = (0x22, 0x11, 0x11)
    bw.flush()

    out = bytearray(b"\xff\xd8")                          # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                              # APP0
    for tq, q in ((0, ql), (1, qc)):                      # DQT (zigzagged)
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(int(v) for v in q.reshape(64)[ZIGZAG]))
    out += (b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])  # SOF0
            + struct.pack(">HH", true_h, true_w) + bytes([3])
            + bytes([1, samp[0], 0]) + bytes([2, samp[1], 1])
            + bytes([3, samp[2], 1]))
    out += _dht_segment(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_segment(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += (b"\xff\xda" + struct.pack(">H", 12) + bytes([3])  # SOS
            + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
            + bytes([0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# --- minimal decoder (round-trip tests only) ----------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                assert self.data[self.pos] == 0x00, "unexpected marker"
                self.pos += 1
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huffman(br: _BitReader, table: Dict[Tuple[int, int], int]
                    ) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_rgb(data: bytes) -> np.ndarray:
    """Decode baseline 3-component JFIF with any (hi, vi) sampling
    the SOF declares — 4:4:4 (1x1,1x1,1x1) and the majority
    real-world 4:2:0 (2x2,1x1,1x1) in particular (round-4 VERDICT
    #3).  Subsampled chroma planes are nearest-replicated back to
    full resolution (the JFIF box-filter inverse)."""
    assert data[:2] == b"\xff\xd8"
    pos = 2
    quant: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    h = w = 0
    comp_q: Dict[int, int] = {}
    comp_s: Dict[int, Tuple[int, int]] = {}      # (hi, vi) per comp
    comp_t: Dict[int, Tuple[int, int]] = {}
    order = []
    while pos < len(data):
        assert data[pos] == 0xFF, hex(data[pos])
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            tq = seg[0] & 0x0F
            dezig = np.zeros(64, dtype=np.int32)
            dezig[ZIGZAG] = np.frombuffer(seg[1:65], np.uint8)
            quant[tq] = dezig.reshape(8, 8)
        elif marker == 0xC0:
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comp_q[cid] = tq
                comp_s[cid] = (hv >> 4, hv & 0x0F)
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1:off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17:off + 17 + nvals])
                table: Dict[Tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc_th >> 4, tc_th & 0x0F)] = table
                off += 17 + nvals
        elif marker == 0xDA:
            ncomp = seg[0]
            for c in range(ncomp):
                cid, tdta = seg[1 + 2 * c:3 + 2 * c]
                comp_t[cid] = (tdta >> 4, tdta & 0x0F)
                order.append(cid)
            break
    hmax = max(s[0] for s in comp_s.values())
    vmax = max(s[1] for s in comp_s.values())
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    br = _BitReader(data[pos:])
    prev = {cid: 0 for cid in order}
    # per-component block-plane: (mcus_y*vi, mcus_x*hi) 8x8 blocks
    planes = {cid: np.zeros((mcus_y * comp_s[cid][1] * 8,
                             mcus_x * comp_s[cid][0] * 8))
              for cid in order}

    def _decode_one(cid):
        td, ta = comp_t[cid]
        zz = np.zeros(64, dtype=np.int32)
        s = _decode_huffman(br, huff[(0, td)])
        diff = _extend(br.read_bits(s), s)
        prev[cid] += diff
        zz[0] = prev[cid]
        k = 1
        while k < 64:
            rs = _decode_huffman(br, huff[(1, ta)])
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += rs >> 4
            size = rs & 0x0F
            zz[k] = _extend(br.read_bits(size), size)
            k += 1
        blk = np.zeros(64, dtype=np.float64)
        blk[ZIGZAG] = zz
        coef = blk.reshape(8, 8) * quant[comp_q[cid]]
        return _DCT.T @ coef @ _DCT

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid in order:
                hi, vi = comp_s[cid]
                for dy in range(vi):
                    for dx in range(hi):
                        by = (my * vi + dy) * 8
                        bx = (mx * hi + dx) * 8
                        planes[cid][by:by + 8, bx:bx + 8] = \
                            _decode_one(cid)
    out = {}
    for cid in order:
        hi, vi = comp_s[cid]
        p = planes[cid]
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        out[cid] = p[:h, :w]
    y, cb, cr = out[1] + 128.0, out[2], out[3]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
