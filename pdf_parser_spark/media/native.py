"""Native (codegen, no-UDF) media header parsing over binary columns,
with bit-exact DuckDB twins.

The 100 TB telemetry question — "what formats, what dimensions, what
sample rates live in this media table?" — does not need a decoder: the
fields sit at fixed offsets in the container header. Both engines can
slice bytes portably through ONE shared trick: ``hex(payload)`` turns
the binary into a hex string, byte ``i`` is the 2-char slice at
``2*i + 1`` (1-based), and ``('0x' || slice)::BIGINT`` / ``conv(slice,
16, 10)`` turns big-endian fields into integers (little-endian fields
reassemble the byte pairs in reverse). Spark keeps the whole thing
inside whole-stage codegen — a map-only projection, no Python, no
shuffle; hex() doubles the bytes transiently inside one expression but
nothing widened ever hits the wire.

Formats: PNG (IHDR width/height, big-endian), GIF87a/89a (logical
screen, little-endian), BMP (BITMAPINFOHEADER, little-endian), WAV
(canonical 44-byte layout: fmt immediately after RIFF/WAVE — the
chunk-walking general case lives in the real codec,
media/codecs.py::wav_decode), JPEG (magic only: dimensions sit in a
variable-offset SOF marker, which is scan logic, not fixed-slice
logic — the mapInPandas feature path handles it), y4m (magic only —
text header, parsed by the codec).

Synthesis helpers build payloads with REAL headers natively (unhex of
format_string'd dimension fields + md5-expanded body bytes), so the
oracle queries round-trip construct -> parse cross-engine without any
external fixture data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic prefixes, hex space (uppercase — both engines' hex()).
_MAGIC = {
    "png": "89504E470D0A1A0A",
    "gif": "474946383",  # GIF87a/GIF89a share GIF8
    "bmp": "424D",
    "wav": "52494646",  # RIFF....WAVE checked separately
    "jpeg": "FFD8FF",
    "y4m": "595556344D504547",  # YUV4MPEG
}


# ------------------------------------------------------ hex-slice helpers


def _hx(payload: Column) -> Column:
    return F.hex(payload)


def _be(h: Column, off: int, nbytes: int) -> Column:
    """Big-endian unsigned int at byte offset `off` (0-based)."""
    return F.conv(F.substring(h, off * 2 + 1, nbytes * 2), 16, 10).cast("long")


def _le(h: Column, off: int, nbytes: int) -> Column:
    """Little-endian unsigned int at byte offset `off`."""
    parts = [
        F.substring(h, (off + k) * 2 + 1, 2) for k in range(nbytes - 1, -1, -1)
    ]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def sniff_format(payload: Column) -> Column:
    """Container format from magic bytes: 'png' | 'jpeg' | 'gif' |
    'bmp' | 'wav' | 'y4m' | 'unknown' — one codegen CASE chain."""
    h = _hx(payload)
    pre = lambda m: F.substring(h, 1, len(m)) == m  # noqa: E731
    return (
        F.when(pre(_MAGIC["png"]), F.lit("png"))
        .when(pre(_MAGIC["jpeg"]), F.lit("jpeg"))
        .when(pre(_MAGIC["gif"]), F.lit("gif"))
        .when(
            pre(_MAGIC["wav"]) & (F.substring(h, 17, 8) == "57415645"),
            F.lit("wav"),
        )
        .when(pre(_MAGIC["y4m"]), F.lit("y4m"))
        .when(pre(_MAGIC["bmp"]), F.lit("bmp"))
        .otherwise(F.lit("unknown"))
    )


def media_metadata(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, format, width, height, sample_rate, channels, n_bytes) —
    header-only, map-only, 100% codegen. Fields a format does not
    carry (or that need marker scanning — JPEG dims) are NULL."""
    h = _hx(F.col(payload_col))
    fmt = sniff_format(F.col(payload_col))
    width = (
        F.when(fmt == "png", _be(h, 16, 4))
        .when(fmt == "gif", _le(h, 6, 2))
        .when(fmt == "bmp", _le(h, 18, 4))
    )
    height = (
        F.when(fmt == "png", _be(h, 20, 4))
        .when(fmt == "gif", _le(h, 8, 2))
        .when(fmt == "bmp", _le(h, 22, 4))
    )
    rate = F.when(fmt == "wav", _le(h, 24, 4))
    channels = F.when(fmt == "wav", _le(h, 22, 2))
    return media.select(
        F.col(id_col),
        fmt.alias("format"),
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
        rate.cast("long").alias("sample_rate"),
        channels.cast("long").alias("channels"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )


def media_metadata_sql(
    table: str, id_col: str = "media_id", payload_expr: str = "payload"
) -> str:
    """DuckDB twin of :func:`media_metadata` over `payload_expr`
    (a BLOB expression) — same hex-slice arithmetic."""

    def be(off: int, n: int) -> str:
        return f"('0x' || substr(h, {off * 2 + 1}, {n * 2}))::BIGINT"

    def le(off: int, n: int) -> str:
        parts = " || ".join(
            f"substr(h, {(off + k) * 2 + 1}, 2)" for k in range(n - 1, -1, -1)
        )
        return f"('0x' || {parts})::BIGINT"

    fmt = f"""CASE
        WHEN substr(h, 1, 16) = '{_MAGIC["png"]}' THEN 'png'
        WHEN substr(h, 1, 6) = '{_MAGIC["jpeg"]}' THEN 'jpeg'
        WHEN substr(h, 1, 9) = '{_MAGIC["gif"]}' THEN 'gif'
        WHEN substr(h, 1, 8) = '{_MAGIC["wav"]}'
             AND substr(h, 17, 8) = '57415645' THEN 'wav'
        WHEN substr(h, 1, 16) = '{_MAGIC["y4m"]}' THEN 'y4m'
        WHEN substr(h, 1, 4) = '{_MAGIC["bmp"]}' THEN 'bmp'
        ELSE 'unknown' END"""
    return f"""
SELECT {id_col} AS media_id,
       fmt AS format,
       CASE WHEN fmt = 'png' THEN {be(16, 4)}
            WHEN fmt = 'gif' THEN {le(6, 2)}
            WHEN fmt = 'bmp' THEN {le(18, 4)} END AS width,
       CASE WHEN fmt = 'png' THEN {be(20, 4)}
            WHEN fmt = 'gif' THEN {le(8, 2)}
            WHEN fmt = 'bmp' THEN {le(22, 4)} END AS height,
       CASE WHEN fmt = 'wav' THEN {le(24, 4)} END AS sample_rate,
       CASE WHEN fmt = 'wav' THEN {le(22, 2)} END AS channels,
       octet_length(payload)::BIGINT AS n_bytes
FROM (
  SELECT {id_col}, payload, hex(payload) AS h, {fmt} AS fmt
  FROM (SELECT {id_col}, {payload_expr} AS payload FROM {table})
)
"""


# --------------------------------------------------------- synthesis
#
# Deterministic payloads with REAL headers, built natively on both
# engines (no external data, TESTDATA.md rule). Dimension fields vary
# per row so the parse is exercised across the value space.


def le16_hex(c: Column) -> Column:
    """int column -> 2-byte little-endian hex string."""
    return F.concat(
        F.substring(F.format_string("%04X", c), 3, 2),
        F.substring(F.format_string("%04X", c), 1, 2),
    )


def le32_hex(c: Column) -> Column:
    """int column -> 4-byte little-endian hex string."""
    return F.concat(*[
        F.substring(F.format_string("%08X", c), 8 - 2 * k + 1, 2)
        for k in range(1, 5)
    ])


def le32_hex_sql(expr: str) -> str:
    return (
        "(" + " || ".join(
            f"substr(printf('%08X', {expr}), {8 - 2 * k + 1}, 2)"
            for k in range(1, 5)
        ) + ")"
    )


def synth_header_hex(doc_id: Column) -> Column:
    """Per-row container header (hex string) with REAL magic + fields:
    doc_id % 5 -> png | gif | bmp | wav | jpeg. Dims/rate derive from
    doc_id (w = 16 + id*7 % 480, h = 16 + id*13 % 360, rate = 8000 +
    id%8 * 1000, ch = 1 + id%2); the jpeg branch carries SOI + an
    APP0/JFIF stub — telemetry sniffs the magic and reports NULL dims
    (dimensions need the SOF marker walk, out of codegen scope)."""
    w = (F.lit(16) + F.pmod(doc_id * 7, F.lit(480))).cast("int")
    hh = (F.lit(16) + F.pmod(doc_id * 13, F.lit(360))).cast("int")
    rate = (F.lit(8000) + F.pmod(doc_id, F.lit(8)) * 1000).cast("int")
    ch = (F.lit(1) + F.pmod(doc_id, F.lit(2))).cast("int")
    be32 = lambda c: F.format_string("%08X", c)  # noqa: E731
    le16, le32 = le16_hex, le32_hex
    png = F.concat(
        F.lit(_MAGIC["png"] + "0000000D49484452"),
        be32(w), be32(hh), F.lit("0806000000"),
    )
    gif = F.concat(F.lit("474946383961"), le16(w), le16(hh), F.lit("F70000"))
    bmp = F.concat(
        F.lit("424D00000000000000003600000028000000"),
        le32(w), le32(hh), F.lit("0100180000000000"),
    )
    wav = F.concat(
        F.lit("524946460000000057415645666D7420100000000100"),
        le16(ch), le32(rate), le32(rate * ch), le16(ch), F.lit("0800"),
        F.lit("64617461"),
    )
    jpeg = F.lit(_MAGIC["jpeg"] + "E000104A46494600010100000100010000")
    sel = F.pmod(doc_id, F.lit(5))
    return (
        F.when(sel == 0, png)
        .when(sel == 1, gif)
        .when(sel == 2, bmp)
        .when(sel == 3, wav)
        .otherwise(jpeg)
    )


def synth_header_hex_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`synth_header_hex` (same arithmetic; %
    on non-negative ids matches pmod)."""
    i = f"({id_expr})"
    w = f"(16 + {i} * 7 % 480)::INT"
    hh = f"(16 + {i} * 13 % 360)::INT"
    rate = f"(8000 + {i} % 8 * 1000)::INT"
    ch = f"(1 + {i} % 2)::INT"
    be32 = lambda c: f"printf('%08X', {c})"  # noqa: E731
    le16 = (  # noqa: E731
        lambda c: f"(substr(printf('%04X', {c}), 3, 2) || "
        f"substr(printf('%04X', {c}), 1, 2))"
    )
    le32 = lambda c: (  # noqa: E731
        "(" + " || ".join(
            f"substr(printf('%08X', {c}), {8 - 2 * k + 1}, 2)"
            for k in range(1, 5)
        ) + ")"
    )
    png = (
        f"('{_MAGIC['png']}0000000D49484452' || {be32(w)} || {be32(hh)}"
        " || '0806000000')"
    )
    gif = f"('474946383961' || {le16(w)} || {le16(hh)} || 'F70000')"
    bmp = (
        "('424D00000000000000003600000028000000' || "
        f"{le32(w)} || {le32(hh)} || '0100180000000000')"
    )
    wav = (
        "('524946460000000057415645666D7420100000000100' || "
        f"{le16(ch)} || {le32(rate)} || {le32(f'({rate} * {ch})')} || "
        f"{le16(ch)} || '0800' || '64617461')"
    )
    jpeg = f"'{_MAGIC['jpeg']}E000104A46494600010100000100010000'"
    return f"""CASE {i} % 5
        WHEN 0 THEN {png}
        WHEN 1 THEN {gif}
        WHEN 2 THEN {bmp}
        WHEN 3 THEN {wav}
        ELSE {jpeg} END"""


def md5_stream_hex(seed: Column, n_bytes: int) -> Column:
    """`n_bytes` deterministic pseudo-random bytes as a hex string:
    concat of md5(seed || ':' || blockIdx) blocks (16 bytes each) —
    the portable body-byte generator for synthesized pixel/sample
    data. Upper-cased so it concatenates with header hex."""
    blocks = [
        F.md5(F.concat(seed.cast("string"), F.lit(f":{b}")))
        for b in range((n_bytes + 15) // 16)
    ]
    return F.substring(F.upper(F.concat(*blocks)), 1, n_bytes * 2)


def md5_stream_hex_sql(seed_expr: str, n_bytes: int) -> str:
    blocks = " || ".join(
        f"md5(({seed_expr})::VARCHAR || ':{b}')"
        for b in range((n_bytes + 15) // 16)
    )
    return f"substr(upper({blocks}), 1, {n_bytes * 2})"
