# -*- coding: utf-8 -*-
"""Charset sniffing + decoding for raw web-page bytes (the
``html:binary`` column of the north-rule input table).

A Common-Crawl-style pipeline receives PAGE BYTES, not text: before
boilerplate strip, mojibake repair, or any dedup hash can run, every
payload must be assigned a charset and decoded. This module is that
front door, implemented the way the WHATWG Encoding standard +
HTML's `encoding sniffing algorithm` prescribe the browser-observable
subset (https://encoding.spec.whatwg.org/,
https://html.spec.whatwg.org/multipage/parsing.html#prescan — public
specs), with the same precedence real crawl pipelines (CCNet, C4)
apply:

1. **BOM wins**: EF BB BF → utf-8, FF FE → utf-16le, FE FF → utf-16be.
2. **`<meta charset=...>` prescan** over the first 1024 bytes (both
   the `charset=` attribute and the `http-equiv` form — the pattern
   matches ``charset=`` anywhere inside a ``<meta ...>`` tag, which
   covers ``content="text/html; charset=..."`` too). Labels are
   normalized per the WHATWG label table subset below; a meta-declared
   utf-16 maps to utf-8 (the spec's own quirk — utf-16 content could
   not have produced an ASCII-readable meta tag).
3. **Verified meta-utf-8**: a meta-declared utf-8 is TRUSTED only if
   the byte stream actually validates; otherwise the row falls back to
   windows-1252 (deterministic and engine-portable, where the spec's
   U+FFFD replacement path is engine-specific — documented deviation,
   matching CCNet's discard-don't-replace posture).
4. **Validity fallback**: no BOM, no meta → utf-8 if the stream is
   valid UTF-8, else windows-1252 (the WHATWG default for the
   no-information case).

Scale design (100 TB): everything is ONE codegen projection over
``hex(payload)`` — BOM check is a prefix compare, the meta prescan is
a single generated case-insensitive regex over the first 2048 hex
chars, UTF-8 validity is a single anchored regex pass, and decode is
native `decode`/`translate`. No Python, no UDF, no shuffle: this tier
rides the same scan as extraction. The hex-space twin
(:func:`sniff_charset_sql` / :func:`decode_html_sql`) lets DuckDB
replay the identical logic — the regexes are GENERATED ONCE and
shared verbatim by both engines.

Alignment note: a regex over a hex string can match at odd offsets
(byte-crossing). Every pattern here is either prefix-anchored or
starts with ``^(?:..)*?`` so the match is provably byte-aligned, and
"any byte except X" classes are written as aligned-pair alternations
(no lookarounds — DuckDB's RE2 has none).

The windows-1252 decode has two implementations with one contract
(the `functions/mojibake.py` pattern): :func:`decode_cp1252` is the
scale path (native ISO-8859-1 decode + ONE `translate` of the 27
cp1252 C1 graphics — 2 string passes), and the SQL twin transcodes
cp1252 bytes to UTF-8 bytes entirely in hex space; a pytest pins the
two byte-identical over the full 0x00-0xFF repertoire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.functions.mojibake import (
    _CP1252_GRAPHICS,
    C1_CHARS,
    CP1252_CHARS,
)

# --------------------------------------------------- generated patterns


def _hex_ci(ch: str) -> str:
    """Case-insensitive single ASCII char as an aligned hex-pair
    alternation."""
    lo, up = ch.lower(), ch.upper()
    if lo == up:
        return "%02X" % ord(ch)
    return "(?:%02X|%02X)" % (ord(up), ord(lo))


def _hex_word_ci(word: str) -> str:
    return "".join(_hex_ci(c) for c in word)


#: any byte except '>' (0x3E), as an aligned pair alternation.
_NOT_GT = "(?:[0-24-9A-F][0-9A-F]|3[0-9A-DF])"
#: HTML whitespace bytes (space, tab, LF, FF, CR).
_WS = "(?:20|09|0A|0C|0D)"
#: charset label chars [-._0-9A-Za-z] as aligned pairs.
_LABEL = "(?:2D|2E|5F|3[0-9]|4[1-9A-F]|5[0-9A]|6[1-9A-F]|7[0-9A])"

#: the meta prescan: `<meta` + ws-or-/ ... `charset` ws* `=` ws*
#: quote? (label) — one search over the first 2048 hex chars,
#: byte-aligned by the leading `^(?:..)*?`.
META_CHARSET_HEX_RE = (
    "^(?:..)*?"
    + "3C" + _hex_word_ci("meta") + "(?:20|09|0A|0C|0D|2F)"
    + _NOT_GT + "*?"
    + _hex_word_ci("charset")
    + _WS + "*" + "3D" + _WS + "*"
    + "(?:22|27)?"
    + "(" + _LABEL + "{1,40})"
)

#: anchored full-stream UTF-8 shape (RFC 3629 table): ASCII, 2-byte
#: C2-DF, 3-byte with overlong/surrogate leads excluded, 4-byte with
#: the U+10FFFF ceiling — a match PROVES `decode(..., 'UTF-8')` is
#: safe under Spark 4's strict codingErrorAction.
_CONT = "[89AB][0-9A-F]"
UTF8_VALID_HEX_RE = (
    "^(?:"
    "[0-7][0-9A-F]"
    f"|(?:C[2-9A-F]|D[0-9A-F]){_CONT}"
    f"|E0[AB][0-9A-F]{_CONT}"
    f"|ED[89][0-9A-F]{_CONT}"
    f"|(?:E[1-9A-C]|E[EF]){_CONT}{_CONT}"
    f"|F0[9AB][0-9A-F]{_CONT}{_CONT}"
    f"|F[1-3]{_CONT}{_CONT}{_CONT}"
    f"|F48[0-9A-F]{_CONT}{_CONT}"
    ")*$"
)

#: utf-16le / utf-16be payloads (AFTER the BOM) whose every code unit
#: is printable-ASCII-or-control 0x01-0x7F — the portably decodable
#: subset; anything else decodes to NULL (documented: non-ASCII utf-16
#: is ~0.01% of the web, and a real cluster can route those few rows
#: through `F.decode(payload, 'UTF-16LE')`, which the portable oracle
#: cannot replay).
UTF16LE_ASCII_HEX_RE = "^(?:(?:0[1-9A-F]|[1-7][0-9A-F])00)*$"
UTF16BE_ASCII_HEX_RE = "^(?:00(?:0[1-9A-F]|[1-7][0-9A-F]))*$"

#: WHATWG label table subset (https://encoding.spec.whatwg.org/
#: #names-and-labels): lowercased label → canonical charset name.
#: utf-16 labels map to utf-8 per the spec's prescan rule.
CHARSET_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "l1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "ansi_x3.4-1968": "windows-1252",
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}


# ------------------------------------------------- python worker mirror
#
# The extraction pipeline's HTML route (jobs/extract.py) runs inside a
# mapInPandas worker, where real codecs are available. These mirrors
# apply the SAME precedence as the column path, but at full fidelity
# where the column path is oracle-portability-bounded: utf-16 decodes
# completely (not just the ASCII subset), and a BOM'd-but-invalid
# utf-8 stream decodes with U+FFFD replacement (the column path
# returns NULL there — both documented; tests pin agreement on every
# input where both are defined).

import re as _re

_META_BYTES_RE = _re.compile(
    rb"<meta[ \t\n\f\r/][^>]*?charset[ \t\n\f\r]*=[ \t\n\f\r]*"
    rb"[\"']?([A-Za-z0-9._\-]{1,40})",
    _re.IGNORECASE,
)


def meta_charset_label_bytes(payload: bytes) -> str:
    m = _META_BYTES_RE.search(payload[:1024])
    return m.group(1).decode("ascii").lower() if m else ""


def _utf8_valid(payload: bytes) -> bool:
    try:
        payload.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


def sniff_bytes(payload: bytes) -> str:
    """Python mirror of :func:`sniff_charset` (same verdicts on the
    same bytes)."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16le"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16be"
    meta = CHARSET_LABELS.get(meta_charset_label_bytes(payload))
    if meta == "utf-8":
        return "utf-8" if _utf8_valid(payload) else "windows-1252"
    if meta == "windows-1252":
        return "windows-1252"
    return "utf-8" if _utf8_valid(payload) else "windows-1252"


def _sloppy_cp1252_bytes(payload: bytes) -> str:
    # the mojibake module's sloppy-cp1252 convention: graphics for the
    # 27 defined C1 bytes, C1 passthrough for the 5 undefined ones
    return "".join(_CP1252_GRAPHICS.get(b, chr(b)) for b in payload)


def decode_bytes(payload: bytes, charset: str = None) -> str:
    """Full-fidelity worker-side decode under :func:`sniff_bytes`
    (pass ``charset`` to reuse an already-computed verdict — the
    sniff's utf-8 re-validation is the expensive part)."""
    cs = sniff_bytes(payload) if charset is None else charset
    if cs == "utf-8":
        body = payload[3:] if payload.startswith(b"\xef\xbb\xbf") else payload
        return body.decode("utf-8", errors="replace")
    if cs == "utf-16le":
        return payload[2:].decode("utf-16-le", errors="replace")
    if cs == "utf-16be":
        return payload[2:].decode("utf-16-be", errors="replace")
    return _sloppy_cp1252_bytes(payload)


# ------------------------------------------------------- spark columns


def _hx(payload: Column) -> Column:
    return F.hex(payload)


def bom_charset(payload: Column) -> Column:
    """BOM → 'utf-8' | 'utf-16le' | 'utf-16be' | NULL."""
    h = _hx(payload)
    return (
        F.when(F.substring(h, 1, 6) == "EFBBBF", F.lit("utf-8"))
        .when(F.substring(h, 1, 4) == "FFFE", F.lit("utf-16le"))
        .when(F.substring(h, 1, 4) == "FEFF", F.lit("utf-16be"))
    )


def meta_charset_label(payload: Column) -> Column:
    """Raw lowercased label from the 1024-byte meta prescan
    ('' when no meta charset is present)."""
    hex1k = F.substring(_hx(payload), 1, 2048)
    lab_hex = F.regexp_extract(hex1k, META_CHARSET_HEX_RE, 1)
    return F.when(
        lab_hex != "", F.lower(F.decode(F.unhex(lab_hex), "UTF-8"))
    ).otherwise(F.lit(""))


def _normalize_label(label: Column) -> Column:
    """WHATWG label → canonical name (NULL = unknown) as ONE literal
    map lookup — a 17-arm CASE chain would duplicate the (regex-heavy)
    label child per arm and blow generated code past the JVM's 64 KB
    method limit when further inlined downstream."""
    kv = []
    for lab, name in CHARSET_LABELS.items():
        kv += [F.lit(lab), F.lit(name)]
    return F.try_element_at(F.create_map(*kv), label)


def _charset_verdict(bom: Column, meta: Column, valid8: Column) -> Column:
    """Precedence CASE over prepared (bom, normalized meta, utf-8
    validity) columns — shared by the one-expression
    :func:`sniff_charset` and the staged :func:`decode_pages`."""
    return (
        F.when(bom.isNotNull(), bom)
        .when((meta == "utf-8") & valid8, F.lit("utf-8"))
        .when(meta == "utf-8", F.lit("windows-1252"))  # unverifiable meta
        .when(meta == "windows-1252", F.lit("windows-1252"))
        .when(valid8, F.lit("utf-8"))
        .otherwise(F.lit("windows-1252"))
    )


def sniff_charset(payload: Column) -> Column:
    """Final charset verdict per the module-head precedence:
    'utf-8' | 'utf-16le' | 'utf-16be' | 'windows-1252'."""
    return _charset_verdict(
        bom_charset(payload),
        _normalize_label(meta_charset_label(payload)),
        _hx(payload).rlike(UTF8_VALID_HEX_RE),
    )


def decode_cp1252(payload_hex: Column) -> Column:
    """Scale-path windows-1252 decode of a hex byte string: native
    ISO-8859-1 decode (1:1 byte→codepoint, can never fail) + ONE
    translate of the 27 cp1252 C1 graphics; the five undefined bytes
    pass through as C1 codepoints (the `sloppy-cp1252` convention
    shared with functions/mojibake.py)."""
    return F.translate(
        F.decode(F.unhex(payload_hex), "ISO-8859-1"), C1_CHARS, CP1252_CHARS
    )


def decode_html(payload: Column, charset: Column = None) -> Column:
    """payload bytes → text under the sniffed (or given) charset.

    utf-8: BOM stripped, native decode (sniffing guaranteed
    validity). windows-1252: :func:`decode_cp1252`. utf-16le/be: the
    ASCII-subset hex fold (NULL beyond it — see
    ``UTF16LE_ASCII_HEX_RE``). One codegen CASE; only the matching
    branch evaluates per row."""
    h = _hx(payload)
    cs = sniff_charset(payload) if charset is None else charset
    h8 = F.when(F.substring(h, 1, 6) == "EFBBBF", F.substring(h, 7, 2 ** 30)
                ).otherwise(h)
    h16 = F.substring(h, 5, 2 ** 30)  # BOM-stripped utf-16 body
    le_ok = h16.rlike(UTF16LE_ASCII_HEX_RE)
    be_ok = h16.rlike(UTF16BE_ASCII_HEX_RE)
    return (
        # the h8 validity guard covers the one verdict path that does
        # not itself prove validity (a BOM'd stream with broken utf-8
        # after it): NULL there, never a strict-decode runtime error;
        # the worker mirror (`decode_bytes`) replaces instead.
        F.when(
            (cs == "utf-8") & h8.rlike(UTF8_VALID_HEX_RE),
            F.decode(F.unhex(h8), "UTF-8"),
        )
        .when(cs == "windows-1252", decode_cp1252(h))
        .when(
            (cs == "utf-16le") & le_ok,
            F.decode(F.unhex(F.regexp_replace(h16, "(..)00", "$1")), "UTF-8"),
        )
        .when(
            (cs == "utf-16be") & be_ok,
            F.decode(F.unhex(F.regexp_replace(h16, "00(..)", "$1")), "UTF-8"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def decode_pages(
    pages: DataFrame, payload_col: str = "html", id_col: str = "url"
) -> DataFrame:
    """(id, charset, bom, meta_label, text, n_bytes) over a raw-page
    table — the map-only projection that fronts the extraction tier.

    Staged as three projections so each heavy sub-expression (the
    meta-prescan regex, the validity regex, the verdict CASE) is
    computed ONCE per row: CollapseProject declines to inline
    non-cheap aliased expressions, so the staging survives
    optimization and the plan stays inside one WholeStageCodegen
    span (a single fused expression tree duplicated the prescan
    regex per CASE arm and overflowed the JVM's 64 KB method limit)."""
    p = F.col(payload_col)
    staged = pages.select(
        F.col(id_col),
        p.alias("__payload"),
        bom_charset(p).alias("bom"),
        meta_charset_label(p).alias("meta_label"),
        _hx(p).rlike(UTF8_VALID_HEX_RE).alias("__valid8"),
        F.length(p).alias("n_bytes"),
    ).select(
        F.col(id_col),
        F.col("__payload"),
        _charset_verdict(
            F.col("bom"),
            _normalize_label(F.col("meta_label")),
            F.col("__valid8"),
        ).alias("charset"),
        F.col("bom"),
        F.col("meta_label"),
        F.col("n_bytes"),
    )
    return staged.select(
        F.col(id_col),
        F.col("charset"),
        F.col("bom"),
        F.col("meta_label"),
        decode_html(F.col("__payload"), F.col("charset")).alias("text"),
        F.col("n_bytes"),
    )


# -------------------------------------------------------- duckdb twins


def _cp1252_block_hex_pairs() -> list[tuple[str, str]]:
    """(cp1252 byte hex, utf-8 bytes hex) for the 0x80-0x9F block —
    generated from the shared graphics table so the twin provably
    covers the repertoire (undefined bytes → C1 passthrough)."""
    pairs = []
    for b in range(0x80, 0xA0):
        ch = _CP1252_GRAPHICS.get(b, chr(b))
        pairs.append(("%02X" % b, ch.encode("utf-8").hex().upper()))
    return pairs


CP1252_BLOCK_UTF8_HEX = _cp1252_block_hex_pairs()


def decode_cp1252_sql(hex_expr: str) -> str:
    """Hex-space cp1252→utf-8 transcode, nesting-bounded (DuckDB's
    binder caps expression depth at 128): byte-align with a LEADING
    separator pass (global `(..)` matches are sequential, hence
    aligned), transcode the Latin-1 ranges algorithmically in 5
    token-anchored regexp passes (0xCx→C38x, 0xDx→C39x, 0xEx→C3Ax,
    0xFx→C3Bx, 0xAx/0xBx→C2+byte), then the 32 literal replaces for
    the cp1252 0x80-0x9F block, strip, unhex, decode. Pass order is
    load-bearing: every pass's OUTPUT starts '|C2'/'|C3'/'|E2'…, which
    no LATER pass's token-anchored pattern can rematch."""
    out = f"regexp_replace({hex_expr}, '(..)', '|\\1', 'g')"
    for lead, pre in (("C", "C38"), ("D", "C39"), ("E", "C3A"), ("F", "C3B")):
        out = f"regexp_replace({out}, '\\|{lead}([0-9A-F])', '|{pre}\\1', 'g')"
    out = f"regexp_replace({out}, '\\|([AB][0-9A-F])', '|C2\\1', 'g')"
    for b_hex, u_hex in CP1252_BLOCK_UTF8_HEX:
        out = f"replace({out}, '|{b_hex}', '|{u_hex}')"
    return f"decode(unhex(replace({out}, '|', '')))"


def _bom_sql(h: str) -> str:
    return (
        f"CASE WHEN substring({h}, 1, 6) = 'EFBBBF' THEN 'utf-8'"
        f" WHEN substring({h}, 1, 4) = 'FFFE' THEN 'utf-16le'"
        f" WHEN substring({h}, 1, 4) = 'FEFF' THEN 'utf-16be' END"
    )


def _meta_label_sql(h: str) -> str:
    lab = (
        f"regexp_extract(substring({h}, 1, 2048),"
        f" '{META_CHARSET_HEX_RE}', 1)"
    )
    return (
        f"CASE WHEN {lab} <> '' THEN lower(decode(unhex({lab})))"
        f" ELSE '' END"
    )


def _norm_label_sql(label: str) -> str:
    whens = " ".join(
        f"WHEN {label} = '{lab}' THEN '{name}'"
        for lab, name in CHARSET_LABELS.items()
    )
    return f"CASE {whens} END"


def sniff_charset_sql(payload_expr: str) -> str:
    """DuckDB twin of :func:`sniff_charset` over a BLOB expression —
    same generated regexes, same precedence CASE."""
    h = f"hex({payload_expr})"
    bom = _bom_sql(h)
    meta = _norm_label_sql(_meta_label_sql(h))
    valid8 = f"regexp_matches({h}, '{UTF8_VALID_HEX_RE}')"
    return (
        f"CASE WHEN ({bom}) IS NOT NULL THEN ({bom})"
        f" WHEN ({meta}) = 'utf-8' AND {valid8} THEN 'utf-8'"
        f" WHEN ({meta}) = 'utf-8' THEN 'windows-1252'"
        f" WHEN ({meta}) = 'windows-1252' THEN 'windows-1252'"
        f" WHEN {valid8} THEN 'utf-8'"
        f" ELSE 'windows-1252' END"
    )


def decode_html_sql(payload_expr: str) -> str:
    """DuckDB twin of :func:`decode_html` (sniffed charset)."""
    h = f"hex({payload_expr})"
    cs = sniff_charset_sql(payload_expr)
    h8 = (
        f"CASE WHEN substring({h}, 1, 6) = 'EFBBBF'"
        f" THEN substring({h}, 7) ELSE {h} END"
    )
    h16 = f"substring({h}, 5)"
    le = f"regexp_replace({h16}, '(..)00', '\\1', 'g')"
    be = f"regexp_replace({h16}, '00(..)', '\\1', 'g')"
    return (
        f"CASE WHEN ({cs}) = 'utf-8'"
        f" AND regexp_matches({h8}, '{UTF8_VALID_HEX_RE}')"
        f" THEN decode(unhex({h8}))"
        f" WHEN ({cs}) = 'windows-1252' THEN {decode_cp1252_sql(h)}"
        f" WHEN ({cs}) = 'utf-16le'"
        f" AND regexp_matches({h16}, '{UTF16LE_ASCII_HEX_RE}')"
        f" THEN decode(unhex({le}))"
        f" WHEN ({cs}) = 'utf-16be'"
        f" AND regexp_matches({h16}, '{UTF16BE_ASCII_HEX_RE}')"
        f" THEN decode(unhex({be}))"
        f" ELSE NULL END"
    )


def decode_pages_sql(
    pages_sql: str, payload_col: str = "html", id_col: str = "url"
) -> str:
    """DuckDB twin of :func:`decode_pages`."""
    p = payload_col
    h = f"hex({p})"
    return (
        f"SELECT {id_col},"
        f" {sniff_charset_sql(p)} AS charset,"
        f" {_bom_sql(h)} AS bom,"
        f" {_meta_label_sql(h)} AS meta_label,"
        f" {decode_html_sql(p)} AS text,"
        f" octet_length({p}) AS n_bytes"
        f" FROM ({pages_sql}) pages"
    )
