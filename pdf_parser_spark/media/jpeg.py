"""Pure-Python + numpy baseline JPEG codec (SOF0/SOF1).

Closes the last library-bound image stub (VERDICT r4 item 5): the
reference rasterizes PDFs with ghostscript (`table_extractor.py:173`)
and hands pixel work to camelot/OpenCV; this engine decodes the
dominant web image format from bytes, in-process, so `decode_image`
(operators/multimodal.py) and the PDF image-overpaint layout tier
(pdf/layout.py) see real pixels on a 1000-executor cluster with no
native dependency.

Decode path (ITU-T T.81 baseline sequential):

- marker walk: DQT (8/16-bit precision), DHT (canonical Huffman),
  SOF0/SOF1, DRI restart interval, SOS, skip APPn/COM;
- entropy decode: table-driven canonical Huffman over a destuffed
  (0xFF00 -> 0xFF) bitstream, DC prediction per component, restart
  markers reset predictors and byte-align;
- per-component coefficient planes are collected FIRST, then every
  8x8 block is dequantized + inverse-DCT'd in ONE vectorized einsum
  (the hot loop is Huffman only — numpy does the math);
- chroma upsampling is box replication (np.repeat), YCbCr -> RGB is
  the JFIF matrix with floor(x + 0.5) rounding — deterministic
  everywhere, no libjpeg "fancy upsampling" dependence;
- 1-component scans decode to (h, w) gray, 3-component to (h, w, 3)
  RGB uint8.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
`MediaFormatError` — the planogram corpus (221 DCTDecode streams) is
100% SOF0 4:2:0, and crawled web JPEGs are overwhelmingly baseline;
the error is row-contained by the decode seams.

Encode path: standard baseline encoder (Annex K quantization +
Huffman tables by default, quality scaling per the IJG curve,
optional custom tables) for grayscale and 4:4:4 / 4:2:0 YCbCr.  Two
uses: roundtrip self-validation (no libjpeg exists in-sandbox to
cross-check against, but encode->decode closure pins both
directions), and EXACT gate fixtures — with unit quantization tables
an image built from flat 8x8 tiles carries only DC energy, whose
quantized coefficient is integer-exact, so decode recovers the tile
bytes bit-for-bit and a DuckDB twin can re-derive the expected
pixels (and their aHash) by pure arithmetic.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .codecs import MediaFormatError

# ---------------------------------------------------------------- tables

#: zig-zag scan order: ZIGZAG[k] = raster index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 luminance / K.2 chrominance quantization (raster order)
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 standard Huffman tables: (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: 8x8 DCT-II basis: _DCT_M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


# ------------------------------------------------------- Huffman decode


def _build_decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """Canonical Huffman: {(code_length, code): value}."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.

    Restart markers (0xFFD0-D7) are consumed by :meth:`restart`, which
    the caller invokes at each DRI boundary; hitting one inside a
    symbol is a stream error (baseline restarts are byte-aligned by
    construction)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            # past-the-end padding: T.81 F.2.2.5 pads with 1-bits
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = d[p]
        p += 1
        if b == 0xFF:
            nxt = d[p] if p < len(d) else 0xD9
            if nxt == 0x00:
                p += 1          # stuffed literal 0xFF
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker: don't consume; pad with 1-bits (scan over)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                self.pos = p - 1
                return
            else:
                raise MediaFormatError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        self.pos = p

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def decode_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise MediaFormatError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        self.acc = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise MediaFormatError("missing restart marker")
        self.pos = p + 2


def _receive_extend(r: _BitReader, s: int) -> int:
    """T.81 F.2.2.1 RECEIVE + EXTEND: s magnitude bits -> signed value."""
    if s == 0:
        return 0
    v = r.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


# --------------------------------------------------------------- decode


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array: (h, w) for grayscale scans,
    (h, w, 3) RGB for YCbCr.  Raises :class:`MediaFormatError` for
    progressive/arithmetic/12-bit streams and malformed data."""
    if payload[:2] != b"\xff\xd8":
        raise MediaFormatError("not a JPEG")
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise MediaFormatError("marker sync lost")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + seglen]
        if seglen < 2 or len(seg) != seglen - 2:
            raise MediaFormatError("truncated segment")
        if marker == 0xDB:                          # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    t = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    t = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = t
                qt[tid] = raster
        elif marker == 0xC4:                        # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):                # SOF0/SOF1 baseline
            prec = seg[0]
            if prec != 8:
                raise MediaFormatError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaFormatError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) not supported"
            )
        elif marker == 0xDD:                        # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                        # SOS
            if frame is None:
                raise MediaFormatError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                scomps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 15})
            return _decode_scan(
                payload, i + 2 + seglen, frame, scomps, qt, huff,
                restart_interval,
            )
        i += 2 + seglen
    raise MediaFormatError("no SOS marker found")


def _decode_scan(payload, pos, frame, scomps, qt, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h == 0 or w == 0:
        raise MediaFormatError("zero dimension")
    byid = {c["id"]: c for c in comps}
    order = []
    for sc in scomps:
        c = byid.get(sc["id"])
        if c is None:
            raise MediaFormatError("scan references unknown component")
        order.append((c, sc))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise MediaFormatError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component stacked coefficient blocks (n_blocks, 64) + layout
    coefs = {}
    for c, _sc in order:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        coefs[c["id"]] = np.zeros((bh * bw, 64), dtype=np.int64)

    r = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c, _ in order}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.restart()
                for k in pred:
                    pred[k] = 0
            for c, sc in order:
                dct = huff.get((0, sc["td"]))
                act = huff.get((1, sc["ta"]))
                if dct is None or act is None:
                    raise MediaFormatError("missing Huffman table")
                bw = mcux * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = r.decode_symbol(dct)
                        pred[c["id"]] += _receive_extend(r, s)
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = r.decode_symbol(act)
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break               # EOB
                            k += rr
                            if k > 63:
                                raise MediaFormatError("AC index overflow")
                            blk[k] = _receive_extend(r, ss)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        coefs[c["id"]][row * bw + col] = blk
            mcu_count += 1

    # vectorized dequant + dezigzag + IDCT per component
    planes = {}
    for c, _sc in order:
        q = qt.get(c["tq"])
        if q is None:
            raise MediaFormatError("missing quantization table")
        zz = coefs[c["id"]]                         # (nb, 64) zigzag order
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        deq = (raster * q[np.newaxis, :]).astype(np.float64).reshape(-1, 8, 8)
        # IDCT: X = M^T S M  (S = coefficient block)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, deq, _DCT_M)
        spatial = np.floor(spatial + 128.5)
        np.clip(spatial, 0, 255, out=spatial)
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
            .astype(np.uint8)
        )
        # upsample to full resolution by box replication, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if (vmax % c["v"]) or (hmax % c["h"]):
            raise MediaFormatError("non-integer sampling ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[c["id"]] = plane[:h, :w]

    if len(order) == 1:
        return planes[order[0][0]["id"]]
    if len(order) != 3:
        raise MediaFormatError(f"{len(order)}-component JPEG not supported")
    y = planes[order[0][0]["id"]].astype(np.float64)
    cb = planes[order[1][0]["id"]].astype(np.float64) - 128.0
    cr = planes[order[2][0]["id"]].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    rgb = np.floor(rgb + 0.5)
    np.clip(rgb, 0, 255, out=rgb)
    return rgb.astype(np.uint8)


# --------------------------------------------------------------- encode


def _build_encode_table(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """Canonical Huffman: {value: (code_length, code)}."""
    table: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)               # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)         # 1-bit padding


def _magnitude(v: int) -> Tuple[int, int]:
    """(size, raw bits) for a signed coefficient, T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    if v < 0:
        v = v + (1 << s) - 1
    return s, v & ((1 << s) - 1)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve (jcparam.c semantics, public algorithm)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(bh*8, bw*8) float plane -> (nb, 64) raster DCT coefficients."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    out = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    return out.reshape(-1, 64)


def _encode_plane_blocks(wtr, zz, dc_tab, ac_tab, pred):
    """Entropy-encode one component's (nb, 64) zigzag blocks in the
    given block order; returns the updated DC predictor."""
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s, bitsv = _magnitude(diff)
        ln, code = dc_tab[s]
        wtr.write(ln, code)
        if s:
            wtr.write(s, bitsv)
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_tab[0xF0]             # ZRL
                wtr.write(ln, code)
                run -= 16
            s, bitsv = _magnitude(v)
            ln, code = ac_tab[(run << 4) | s]
            wtr.write(ln, code)
            wtr.write(s, bitsv)
            run = 0
        if last_nz < 63:
            ln, code = ac_tab[0x00]                 # EOB
            wtr.write(ln, code)
    return pred


def jpeg_encode(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    luma_qt: Optional[np.ndarray] = None,
    chroma_qt: Optional[np.ndarray] = None,
) -> bytes:
    """Baseline JPEG encoder: (h, w) gray or (h, w, 3) RGB uint8 ->
    JFIF bytes.  ``subsampling``: "444" or "420" (3-channel only).
    Custom raster-order quantization tables override the
    quality-scaled Annex K defaults (``np.ones(64)`` gives the
    integer-exact flat-tile path the gate fixtures rely on)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise MediaFormatError("uint8 input required")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise MediaFormatError("expected (h,w) or (h,w,3)")
    if subsampling not in ("444", "420"):
        raise MediaFormatError("subsampling must be 444 or 420")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise MediaFormatError("empty image")

    lq = (np.asarray(luma_qt, dtype=np.int64) if luma_qt is not None
          else _scale_qt(STD_LUMA_QT, quality))
    cq = (np.asarray(chroma_qt, dtype=np.int64) if chroma_qt is not None
          else _scale_qt(STD_CHROMA_QT, quality))

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qts = [lq]
        qids = [0]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2] + 128.0
        y = np.floor(y + 0.5)
        cb = np.clip(np.floor(cb + 0.5), 0, 255)
        cr = np.clip(np.floor(cr + 0.5), 0, 255)
        if subsampling == "420":
            # box-average 2x2 (pad to even first)
            def down(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return np.floor(
                    (ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2]
                     + ph[1::2, 1::2]) / 4.0 + 0.5)
            cb, cr = down(cb), down(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [lq, cq, cq]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # zigzag mapping: raster coeff array indexed by ZIGZAG gives
    # zigzag order directly (zz[k] = raster[ZIGZAG[k]])
    zz_all = []
    for p, (sh, sv), q in zip(planes, samp, qts):
        ph = mcuy * sv * 8
        pw = mcux * sh * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        co = _fdct_blocks(p)
        qzd = np.floor(co / q[np.newaxis, :] + 0.5).astype(np.int64)
        zz_all.append(qzd[:, ZIGZAG])

    out = bytearray(b"\xff\xd8")                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, q):
        zzq = q[ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(x) for x in zzq)

    out += dqt(0, lq)
    if not gray:
        out += dqt(1, cq)

    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, STD_DC_LUMA) + dht(1, 0, STD_AC_LUMA)
    if not gray:
        out += dht(0, 1, STD_DC_CHROMA) + dht(1, 1, STD_AC_CHROMA)

    sos = bytes([nc])
    for ci in range(nc):
        td = ta = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_encode_table(*STD_DC_LUMA)
    ac_l = _build_encode_table(*STD_AC_LUMA)
    dc_c = _build_encode_table(*STD_DC_CHROMA)
    ac_c = _build_encode_table(*STD_AC_CHROMA)
    wtr = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                sh, sv = samp[ci]
                bw = mcux * sh
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(sv):
                    for bx in range(sh):
                        row = my * sv + by
                        col = mx * sh + bx
                        blk = zz_all[ci][row * bw + col]
                        preds[ci] = _encode_plane_blocks(
                            wtr, blk[np.newaxis, :], dc_t, ac_t, preds[ci]
                        )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                              # EOI
    return bytes(out)
