# -*- coding: utf-8 -*-
"""Mojibake repair (ftfy-style, Speer 2019 `ftfy` — zenodo 2591652):
undo the single most common web-crawl encoding wreck, UTF-8 bytes
mis-decoded as Windows-1252/Latin-1 ("Café — naïve" shipped as
"CafÃ© â€” naÃ¯ve").  Crawl pipelines fix this BEFORE normalization
and dedup: the mojibake and clean forms of one page otherwise hash
apart and both survive dedup.

Two implementations, same contract:

- :func:`fix_mojibake` — the SCALE path.  Re-encode the string as the
  cp1252 the producer *meant* (a `translate` folds the 27
  cp1252-specific punctuation codepoints back to their C1 byte
  positions, then `encode(..., 'ISO-8859-1')`) and re-decode the bytes
  as UTF-8 — exactly ftfy's core trick, but entirely in native Spark
  expressions (translate/encode/decode/when), zero Python, ~4 string
  passes per row.  The guard PRECEDES the codec round-trip: a row is
  only re-decoded when a structural regex proves the re-encoded bytes
  form a valid UTF-8 stream (lead/continuation shape, overlong and
  surrogate leads excluded), so the expression is safe under Spark 4's
  strict `codingErrorAction` (no reliance on U+FFFD replacement) and
  clean rows, rows with codepoints cp1252 can't carry (real CJK/Greek
  text), and rows that merely *resemble* mojibake but would not
  re-decode are all passed through untouched — ftfy's "don't make it
  worse" invariant.
- :func:`fix_mojibake_portable` — the ORACLE path.  The identical
  repair expressed as a chained literal `replace` over the full
  generated table of (mojibake digraph/trigraph → char) for the
  Latin-1 supplement + cp1252 punctuation repertoire, longest
  sequences first.  DuckDB has no Latin-1 codec, so this is the form
  the cross-engine twin (:func:`fix_mojibake_sql`) can mirror
  byte-identically.  ~120 passes per row — fine at test scale, and
  `tests/test_mojibake.py` pins that both paths agree on mojibake'd
  rows, so the scale path inherits the oracle's verdict.

Scope matches ftfy's default: ONE layer of UTF-8-as-cp1252 per
application (apply twice to peel doubly-encoded text — the tests pin
single-layer semantics).  Deliberately out of scope: UTF-8 as
MacRoman/koi8, HTML-entity unescaping (`html.unescape` belongs in the
HTML extractor), and curly-quote *style* folding — that is
`functions/normalize.py`'s job, which composes after this.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: cp1252 bytes 0x80-0x9F that differ from their C1-control codepoints
#: (the five undefined bytes 81 8D 8F 90 9D fall through to chr(byte),
#: ftfy's "sloppy-windows-1252" behavior).
_CP1252_GRAPHICS = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

#: the two translate tables for the scale path: cp1252 graphic chars
#: <-> their byte positions as C1 codepoints (strictly 1:1).
CP1252_CHARS = "".join(_CP1252_GRAPHICS[b] for b in sorted(_CP1252_GRAPHICS))
C1_CHARS = "".join(chr(b) for b in sorted(_CP1252_GRAPHICS))


def _sloppy_cp1252(bs: bytes) -> str:
    """Decode bytes the way a cp1252 consumer mangles them (undefined
    bytes pass through as their C1 codepoints)."""
    return "".join(_CP1252_GRAPHICS.get(b, chr(b)) for b in bs)


def _build_pairs() -> list[tuple[str, str]]:
    """(mojibake sequence, intended char) for every Latin-1-supplement
    and cp1252-punctuation codepoint — generated, not hand-typed, so
    the table provably covers the repertoire."""
    targets = [chr(cp) for cp in range(0xA0, 0x100)]  # Latin-1 suppl.
    targets += sorted(_CP1252_GRAPHICS.values())       # cp1252 puncts
    pairs = [(_sloppy_cp1252(c.encode("utf-8")), c) for c in targets]
    # Longest mojibake first (3-byte UTF-8 before 2-byte) so e.g.
    # 'â€™' is consumed before any 2-char rule could split it; ties
    # ordered lexically for cross-engine determinism.
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return pairs

MOJIBAKE_PAIRS = _build_pairs()

#: continuation-byte chars: where bytes 0x80-0xBF land after a cp1252
#: mis-decode — 0x80-0x9F become the graphics (or C1 for the five
#: undefined bytes), 0xA0-0xBF stay as their Latin-1-supplement chars.
_CONT_LOW = "".join(_sloppy_cp1252(bytes([b])) for b in range(0x80, 0xA0))
_CONT_HIGH = "\\xa0-\\xbf"
_CONT = f"{_CONT_LOW}{_CONT_HIGH}"

#: rows that plausibly contain UTF-8-as-cp1252: a 2-byte lead char
#: (U+00C2-U+00DF) or 3-byte lead (U+00E0-U+00EF) followed by
#: continuation-range chars.
MOJIBAKE_MARKER = f"[\\xc2-\\xdf][{_CONT}]|[\\xe0-\\xef][{_CONT}]{{2}}"

#: full-stream shape proof: every char is ASCII or part of a
#: well-formed 2/3-byte sequence, with the overlong lead (0xE0 + low
#: continuation) and surrogate lead (0xED + high continuation)
#: excluded — a match GUARANTEES the re-encoded bytes are valid UTF-8,
#: so the decode below can never hit a malformed sequence (safe under
#: Spark 4 strict codingErrorAction; no reliance on U+FFFD).
_VALID_STREAM = (
    f"^(?:[\\x00-\\x7f]"
    f"|[\\xc2-\\xdf][{_CONT}]"
    f"|\\xe0[{_CONT_HIGH}][{_CONT}]"
    f"|\\xed[{_CONT_LOW}][{_CONT}]"
    f"|[\\xe1-\\xec\\xee\\xef][{_CONT}]{{2}})*$"
)


def fix_mojibake(col: Column) -> Column:
    """Scale-path repair: translate cp1252 graphics to C1, re-encode
    ISO-8859-1, re-decode UTF-8 — applied only when the structural
    guard proves the row is a well-formed mojibake stream; everything
    else (clean text, non-cp1252 codepoints, partial/invalid
    sequences, 4-byte emoji mojibake) passes through unchanged."""
    candidate = F.decode(
        F.encode(F.translate(col, CP1252_CHARS, C1_CHARS), "ISO-8859-1"),
        "UTF-8",
    )
    return F.when(
        col.rlike(MOJIBAKE_MARKER) & col.rlike(_VALID_STREAM), candidate
    ).otherwise(col)


def fix_mojibake_portable(col: Column) -> Column:
    """Oracle-path repair: the generated (sequence → char) table as a
    chained literal replace — engine-portable, byte-identical to
    :func:`fix_mojibake_sql` on any input."""
    return reduce(
        lambda acc, p: F.replace(acc, F.lit(p[0]), F.lit(p[1])),
        MOJIBAKE_PAIRS,
        col,
    )


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def fix_mojibake_sql(col: str) -> str:
    """DuckDB twin of :func:`fix_mojibake_portable` (same table, same
    order)."""
    out = col
    for moji, char in MOJIBAKE_PAIRS:
        out = f"replace({out}, {_q(moji)}, {_q(char)})"
    return out
