"""PDF stream filters (PDF 32000-1:2008 §7.4).

Implements the decoders the extraction pipeline needs: FlateDecode
(with PNG predictors, needed for cross-reference streams),
ASCIIHexDecode, ASCII85Decode and RunLengthDecode.  Image codecs
(DCTDecode/JPXDecode/CCITT) are passed through untouched — text
extraction never decodes raster data.
"""

from __future__ import annotations

import zlib


def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        if pos + 1 + rowlen > n:
            break
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        pos += 1 + rowlen
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


#: per-stream decompressed-size cap. A crawled "zip bomb" (a few KB
#: inflating to GBs) would otherwise OOM an executor mid-batch; a real
#: content stream under the crawl's 16 MB payload cap never reaches
#: this. Truncation is a contained per-document degradation.
MAX_DECOMPRESSED = 128 * 1024 * 1024


def flate_decode(data: bytes, params: dict | None) -> bytes:
    d = zlib.decompressobj()
    try:
        # Tolerates truncated streams (common in crawled PDFs): take
        # whatever inflates, bounded by MAX_DECOMPRESSED.
        raw = d.decompress(data, MAX_DECOMPRESSED)
    except zlib.error:
        return b""
    if params:
        pred = int(params.get("Predictor", 1) or 1)
        if pred >= 10:
            raw = _png_predictor(
                raw,
                int(params.get("Colors", 1) or 1),
                int(params.get("BitsPerComponent", 8) or 8),
                int(params.get("Columns", 1) or 1),
            )
        elif pred == 2:  # TIFF predictor, 8-bit only
            colors = int(params.get("Colors", 1) or 1)
            columns = int(params.get("Columns", 1) or 1)
            row = colors * columns
            buf = bytearray(raw)
            for r0 in range(0, len(buf) - row + 1, row):
                for i in range(colors, row):
                    buf[r0 + i] = (buf[r0 + i] + buf[r0 + i - colors]) & 0xFF
            raw = bytes(buf)
    return raw


def ascii_hex_decode(data: bytes, params: dict | None = None) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    digits = bytes(c for c in data if c not in b"\x00\t\n\x0c\r ")
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return b""


def ascii85_decode(data: bytes, params: dict | None = None) -> bytes:
    import base64

    data = data.strip()
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    try:
        return base64.a85decode(data)
    except ValueError:
        return b""


def run_length_decode(data: bytes, params: dict | None = None) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            if i + 1 < n:
                out += bytes([data[i + 1]]) * (257 - l)
            i += 2
    return bytes(out)


_PASSTHROUGH = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode", "Crypt"}


def decode_stream(raw: bytes, stream_dict: dict, resolve) -> bytes:
    """Apply the stream's /Filter chain. ``resolve`` dereferences refs."""
    filters = resolve(stream_dict.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    params = resolve(stream_dict.get("DecodeParms") or stream_dict.get("DP"))
    if not isinstance(params, list):
        params = [params] * len(filters)
    data = raw
    for f, p in zip(filters, params):
        f = str(resolve(f))
        p = resolve(p)
        if isinstance(p, dict):
            p = {k: resolve(v) for k, v in p.items()}
        if f in ("FlateDecode", "Fl"):
            data = flate_decode(data, p)
        elif f in ("ASCIIHexDecode", "AHx"):
            data = ascii_hex_decode(data, p)
        elif f in ("ASCII85Decode", "A85"):
            data = ascii85_decode(data, p)
        elif f in ("RunLengthDecode", "RL"):
            data = run_length_decode(data, p)
        elif f in _PASSTHROUGH:
            return data  # raster codecs: leave encoded
        # unknown filter: pass through
    return data
