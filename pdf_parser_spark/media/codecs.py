"""Pure-Python media codecs (stdlib + numpy only).

Real decoders/encoders for the formats whose byte layout needs no
external library — these make the multimodal tier's decode step REAL
in this sandbox instead of a deterministic fake:

- **PNG** (`png_decode`/`png_encode`): full spec-correct path for
  8-bit gray / gray+alpha / RGB / RGBA, all five scanline filters
  (None/Sub/Up/Average/Paeth, RFC 2083 §6), zlib-compressed IDAT via
  stdlib ``zlib``, CRC-checked chunks. Interlaced (Adam7) and 16-bit
  images are rejected explicitly.
- **BMP** (`bmp_decode`/`bmp_encode`): uncompressed 24-bit
  BITMAPINFOHEADER, bottom-up or top-down, 4-byte row padding.
- **WAV** (`wav_decode`/`wav_encode`): RIFF chunk walk (no canonical-
  offset assumption), PCM u8 / s16le.
- **y4m** (`y4m_decode`/`y4m_encode`): YUV4MPEG2 raw video, C420 /
  Cmono — the one video container that is pure bytes, so frame
  iteration is real.

Baseline JPEG decode/encode (SOF0/SOF1 Huffman + vectorized IDCT)
lives in the sibling ``media/jpeg.py``; `jpeg_dimensions` below stays
the cheap header-only path for telemetry. What stays stubbed
(operators/multimodal.py seams): progressive JPEG and MP4/H.264 —
those genuinely need libjpeg/ffmpeg.

Decoders return numpy arrays; integer arithmetic is used wherever a
cross-engine oracle consumes the result (see media/native.py — the
average-hash compares integer block sums, never float means, so the
Spark/numpy path and the DuckDB byte-slicing twin agree bit-for-bit).

Reference parity: the reference's only media handling is handing image
files to pytesseract (`src/ocr_processor.py:136-155`); this tier is
SURVEY.md §2.5 scale scope for multimodal training data.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (8-bit depth only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class MediaFormatError(ValueError):
    """Payload does not parse as the claimed format."""


# ------------------------------------------------------------------ PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w, channels).

    8-bit depth, color types 0/2/4/6, non-interlaced; raises
    :class:`MediaFormatError` otherwise (and on CRC mismatch — corrupt
    training payloads must fail loudly, not decode to garbage).
    """
    if payload[:8] != PNG_SIG:
        raise MediaFormatError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise MediaFormatError("truncated chunk")
        crc = struct.unpack(">I", payload[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise MediaFormatError(f"unsupported bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise MediaFormatError(f"unsupported color type {color}")
            if comp != 0 or filt != 0:
                raise MediaFormatError("non-standard compression/filter")
            if interlace != 0:
                raise MediaFormatError("Adam7 interlace not supported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise MediaFormatError("no IHDR")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise MediaFormatError("IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (line[x] + _paeth(a, int(prev[x]), int(c))) & 0xFF
        else:
            raise MediaFormatError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, ch)


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, ch) -> PNG bytes (filter 0 or 2)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int64)
        raw.append(filter_type)
        if filter_type == 0:
            raw.extend(line.astype(np.uint8).tobytes())
        elif filter_type == 2:
            raw.extend(((line - prev) & 0xFF).astype(np.uint8).tobytes())
        else:
            raise ValueError("encoder supports filter 0 and 2 only")
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- JPEG


def jpeg_dimensions(payload: bytes) -> Tuple[int, int, int]:
    """(width, height, channels) from the SOF marker — a real marker
    walk (skip each segment by its big-endian length; SOF0/1/2/3 and
    the extended SOF5-15 minus DHT/DAC/RST carry the frame header),
    NOT an entropy decode: the header-only fast path for telemetry —
    full baseline pixel decode lives in media/jpeg.py."""
    if payload[:3] != b"\xff\xd8\xff":
        raise MediaFormatError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise MediaFormatError("desynchronized marker stream")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: bare
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 10 > len(payload):
                raise MediaFormatError("truncated SOF")
            h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
            return w, h, payload[pos + 9]
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            break
        pos += 2 + seg_len
    raise MediaFormatError("no SOF marker found")


# ------------------------------------------------------------------ GIF
#
# GIF87a/89a with a REAL LZW codec (GIF's one non-trivial layer): codes
# are packed LSB-first, the clear code resets the string table, and the
# code width grows by the giflib convention — after processing code #k,
# if the next assignable entry equals 1 << width, widen (cap 12 bits;
# at 4096 entries the decoder stops adding until the next clear and the
# encoder emits a clear itself). Interlaced images de-permute through
# the 4-pass row order of spec §appendix-e. Frames are the raw image
# descriptors (no GCE disposal compositing — feature extraction wants
# dimensions/frame-count/pixels, not playback); transparency indices
# render as their palette color for the same reason.


def _lzw_decode(data: bytes, mcs: int) -> List[int]:
    """GIF-variant LZW: concatenated sub-block bytes -> pixel indices."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    code_size = mcs + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    out: List[int] = []
    prev: Tuple[int, ...] = ()
    acc = accbits = pos = 0
    n = len(data)
    while True:
        while accbits < code_size:
            if pos >= n:
                return out  # missing explicit EOI: tolerate, data ended
            acc |= data[pos] << accbits
            pos += 1
            accbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        accbits -= code_size
        if code == clear:
            table = list(base)
            code_size = mcs + 1
            prev = ()
            continue
        if code == end:
            return out
        if not prev:  # first code after a clear: literal only
            if code >= len(table):
                raise MediaFormatError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
        else:
            raise MediaFormatError("LZW: code beyond table")
        out.extend(entry)
        if prev and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(indices: "np.ndarray", mcs: int) -> bytes:
    """Pixel indices -> GIF LZW bytes (real string table, not the
    clear-every-symbol 'uncompressed' trick)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = accbits = 0
    code_size = mcs + 1

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += code_size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w: Tuple[int, ...] = ()
    for k in map(int, indices):
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        # giflib width rule: widen when the entry about to be assigned
        # no longer fits — BEFORE the assignment (decoder mirror: after
        # ITS add, which lands on the same code-stream position).
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = mcs + 1
        else:
            table[wk] = next_code
            next_code += 1
        w = (k,)
    if w:
        emit(table[w])
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    emit(end)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: Interlace pass (start row, step) order, GIF89a spec appendix E.
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _GIF_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def gif_decode(payload: bytes) -> Tuple[List[np.ndarray], int, int]:
    """GIF bytes -> (frames as uint8 (fh, fw, 3) RGB, canvas_w, canvas_h).

    Global + local color tables, interlace, multi-frame. Extensions
    (GCE/comment/application) are walked and skipped — frames are raw
    image descriptors, not composited playback state.
    """
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise MediaFormatError("not a GIF")
    if len(payload) < 13:
        raise MediaFormatError("truncated GIF header")
    cw, ch_ = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    def sub_blocks(p: int) -> Tuple[bytes, int]:
        parts = []
        while True:
            if p >= len(payload):
                raise MediaFormatError("unterminated sub-blocks")
            ln = payload[p]
            p += 1
            if ln == 0:
                return b"".join(parts), p
            parts.append(payload[p:p + ln])
            p += ln

    frames: List[np.ndarray] = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = sub_blocks(pos)
            continue
        if block != 0x2C:
            raise MediaFormatError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise MediaFormatError("truncated image descriptor")
        _l, _t, fw, fh = struct.unpack("<HHHH", payload[pos:pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise MediaFormatError("no color table for frame")
        if pos >= len(payload):
            raise MediaFormatError("truncated image data")
        mcs = payload[pos]
        if not 2 <= mcs <= 8:
            raise MediaFormatError(f"bad LZW min code size {mcs}")
        data, pos = sub_blocks(pos + 1)
        idx = _lzw_decode(data, mcs)
        if len(idx) < fw * fh:
            raise MediaFormatError("LZW stream short of frame pixels")
        arr = np.asarray(idx[: fw * fh], np.int64).reshape(fh, fw)
        if (arr >= pal.shape[0]).any():
            raise MediaFormatError("pixel index beyond color table")
        if ipacked & 0x40:
            arr = _deinterlace(arr)
        frames.append(pal[arr])
    if not frames:
        raise MediaFormatError("GIF contains no image")
    return frames, cw, ch_


def gif_encode(
    frames, interlace: bool = False, version: bytes = b"89a"
) -> bytes:
    """uint8 (h, w, 3) frame or list of frames -> GIF bytes.

    One shared global color table built from the frames' distinct
    colors (<= 256 or raises), real LZW compression.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w, _ = frames[0].shape
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
    )
    if colors.shape[0] > 256:
        raise MediaFormatError("more than 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    pal = np.zeros((2 << (depth - 1), 3), np.uint8)
    pal[: colors.shape[0]] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((depth - 1) << 4) | (depth - 1))
    out += b"\x00\x00" + pal.tobytes()
    mcs = max(2, depth)
    for f in frames:
        fh, fw, _ = f.shape
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        out.append(0x40 if interlace else 0x00)
        rows = f.reshape(fh, fw, 3)
        if interlace:
            order = [
                y for start, step in _GIF_PASSES for y in range(start, fh, step)
            ]
            rows = rows[np.asarray(order)]
        idx = np.fromiter(
            (lut[tuple(px)] for px in rows.reshape(-1, 3)), np.int64
        )
        lzw = _lzw_encode(idx, mcs)
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------------ BMP


def bmp_decode(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> uint8 (h, w, 3) RGB."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise MediaFormatError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise MediaFormatError("BITMAPCOREHEADER not supported")
    w = struct.unpack("<i", payload[18:22])[0]
    h = struct.unpack("<i", payload[22:26])[0]
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or comp != 0:
        raise MediaFormatError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise MediaFormatError("truncated BMP pixel data")
    rows = []
    for y in range(h):
        off = data_off + y * stride
        row = np.frombuffer(payload, np.uint8, w * 3, off).reshape(w, 3)
        rows.append(row[:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    return img if top_down else img[::-1]


def bmp_encode(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BMP bytes."""
    h, w, ch = img.shape
    assert ch == 3
    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y][:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        pix.extend(row)
        pix.extend(b"\x00" * (stride - w * 3))
    size = 54 + len(pix)
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    )
    return header + bytes(pix)


# ------------------------------------------------------------------ WAV


def wav_decode(payload: bytes) -> Tuple[np.ndarray, int, int]:
    """WAV PCM bytes -> (samples int32 [n, channels], sample_rate, bits).

    Walks RIFF chunks (fmt /data may sit anywhere); u8 samples are
    re-centered to signed (s - 128) so downstream feature math is
    uniform. Integer all the way — no float resampling.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaFormatError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaFormatError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byterate, _align, bits = fmt
    if audio_fmt != 1:
        raise MediaFormatError(f"non-PCM WAV (fmt={audio_fmt})")
    if bits == 8:
        samples = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    elif bits == 16:
        n = len(data) // 2
        samples = np.frombuffer(data, "<i2", n).astype(np.int32)
    else:
        raise MediaFormatError(f"unsupported bit depth {bits}")
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate, bits


def wav_encode(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """int samples [n] or [n, ch] -> canonical 44-byte-header WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 8:
        data = (samples + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * bits // 8
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * block, block, bits)
        + b"data" + struct.pack("<I", len(data)) + data
    )


# ------------------------------------------------------------------ y4m


def y4m_decode(payload: bytes) -> Tuple[List[np.ndarray], int, int, str]:
    """YUV4MPEG2 bytes -> (luma frames [(h, w) uint8 ...], w, h, chroma).

    C420 family and Cmono; chroma planes are skipped (the training
    features of interest — frame count, per-frame luminance — live in
    Y). Raises on truncated frames.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise MediaFormatError("not a y4m stream")
    nl = payload.index(b"\n")
    params = payload[:nl].decode("ascii", "replace").split(" ")[1:]
    w = h = None
    chroma = "420"
    for p in params:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C"):
            chroma = p[1:]
    if not w or not h:
        raise MediaFormatError("missing W/H")
    if chroma.startswith("420"):
        frame_size = w * h + 2 * ((w // 2) * (h // 2))
    elif chroma == "mono":
        frame_size = w * h
    else:
        raise MediaFormatError(f"unsupported chroma {chroma}")
    frames, pos = [], nl + 1
    while pos < len(payload):
        fe = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise MediaFormatError("bad FRAME marker")
        pos = fe + 1
        if pos + frame_size > len(payload):
            raise MediaFormatError("truncated frame")
        frames.append(
            np.frombuffer(payload, np.uint8, w * h, pos).reshape(h, w).copy()
        )
        pos += frame_size
    return frames, w, h, chroma


def y4m_encode(frames: List[np.ndarray], chroma: str = "420") -> bytes:
    """Luma frames (h, w) -> y4m bytes (chroma planes neutral 128)."""
    h, w = frames[0].shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode())
    for f in frames:
        out.extend(b"FRAME\n")
        out.extend(f.astype(np.uint8).tobytes())
        if chroma.startswith("420"):
            out.extend(b"\x80" * (2 * (w // 2) * (h // 2)))
    return bytes(out)


# ------------------------------------------------ perceptual hashing


def gray_sum(img: np.ndarray) -> np.ndarray:
    """RGB -> integer luma proxy (r+g+b as int64, NO division) — the
    exact-arithmetic gray the average-hash oracle reproduces byte-wise
    in SQL. For (h, w) input returns it as int64 unchanged."""
    a = img.astype(np.int64)
    return a.sum(axis=2) if a.ndim == 3 else a


def ahash_bits(gray: np.ndarray, grid: int = 8) -> str:
    """Average hash (aHash) as a grid*grid '0'/'1' string, EXACT
    integer arithmetic: bit(by, bx) = 1 iff the block's pixel sum,
    cross-multiplied against the global sum, exceeds the global mean
    (blocksum * n_pixels > total * n_block — no float means, so the
    numpy path and a SQL byte-slicing twin agree bit-for-bit).

    Pixel (y, x) belongs to block (y*grid // h, x*grid // w) — exact
    integer banding, any image size, no resampling step. Returned as
    a bit string; pack to 4 int16s at real scale if 64 chars/row
    matter (they are narrower than the vectors either way)."""
    g = gray.astype(np.int64)
    h, w = g.shape
    by = np.arange(h) * grid // h
    bx = np.arange(w) * grid // w
    sums = np.zeros((grid, grid), dtype=np.int64)
    counts = np.zeros((grid, grid), dtype=np.int64)
    np.add.at(sums, (by[:, None].repeat(w, 1), bx[None, :].repeat(h, 0)), g)
    np.add.at(counts, (by[:, None].repeat(w, 1), bx[None, :].repeat(h, 0)), 1)
    total = int(g.sum())
    n = h * w
    bits = (sums * n) > (total * counts)
    return "".join("1" if b else "0" for b in bits.reshape(-1))


def phash_bits(gray: np.ndarray, size: int = 32, keep: int = 8) -> str:
    """DCT perceptual hash (pHash): block-average the gray plane to
    ``size`` x ``size``, 2D DCT-II, keep the top-left ``keep`` x
    ``keep`` band minus DC, threshold at the band median. Float path
    (numpy only) — robust to noise/rescale, pytest-verified; use
    :func:`ahash_bits` where a cross-engine oracle is required."""
    g = gray.astype(np.float64)
    h, w = g.shape
    by = np.arange(h) * size // h
    bx = np.arange(w) * size // w
    sums = np.zeros((size, size))
    counts = np.zeros((size, size))
    np.add.at(sums, (by[:, None].repeat(w, 1), bx[None, :].repeat(h, 0)), g)
    np.add.at(counts, (by[:, None].repeat(w, 1), bx[None, :].repeat(h, 0)), 1)
    counts[counts == 0] = 1
    small = sums / counts
    k = np.arange(size)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * size))
    dct = basis @ small @ basis.T
    band = dct[:keep, :keep].reshape(-1)[1:]
    med = np.median(band)
    return "".join("1" if v > med else "0" for v in band)
