# -*- coding: utf-8 -*-
"""CCNet-style text normalization (Wenzek et al. LREC 2020,
arXiv:1911.00359, cc_net text_normalizer): the canonical form webtext
pipelines hash for dedup and feed to LM scoring — lowercase, accents
folded, every digit to 0, unicode punctuation to its ASCII cousin,
whitespace collapsed.  Dedup over RAW text misses trivially-reskinned
duplicates ("Café—2024" vs "cafe-0000"); every dedup family in this
repo (exact md5, minhash, simhash, bloom) accepts a text column, so
`normalize_text(...)` composes in front of all of them.

Engine portability is the design constraint: CCNet folds accents via
NFD + combining-mark strip, but Spark has no NFD builtin and a Python
UDF would put an interpreter in the hottest map of the pipeline.
Instead accents fold through a FIXED 1:1 codepoint table applied with
`translate` — pure whole-stage-codegen in Spark, the identical table
in the DuckDB twin, byte-identical output on both.  The table covers
the Latin-1/Latin-Extended-A repertoire (the overwhelming mass of
accented codepoints in web crawls); multi-char ligature expansions
(ss for ß, oe for œ) are deliberately out of scope — NFD does not
decompose those either, so this matches CCNet's behavior, not just
approximates it.

Scale design: one projection, zero shuffles, zero Python — the
normalization rides the same codegen stage as whatever scan or
filter precedes it; at 100 TB it is free compared to the dedup it
feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: accent → ASCII, strictly 1:1 codepoints (translate semantics).
#: Sources are LOWERCASE only: lower() runs first, so uppercase
#: accented forms arrive here already lowered.
_ACCENT_PAIRS = [
    ("àáâãäåāăą", "aaaaaaaaa"),
    ("çćĉċč", "ccccc"),
    ("ďđ", "dd"),
    ("èéêëēĕėęě", "eeeeeeeee"),
    ("ĝğġģ", "gggg"),
    ("ĥħ", "hh"),
    ("ìíîïĩīĭįı", "iiiiiiiii"),
    ("ĵ", "j"),
    ("ķ", "k"),
    ("ĺļľŀł", "lllll"),
    ("ñńņňŋ", "nnnnn"),
    ("òóôõöøōŏő", "ooooooooo"),
    ("ŕŗř", "rrr"),
    ("śŝşš", "ssss"),
    ("ţťŧ", "ttt"),
    ("ùúûüũūŭůűų", "uuuuuuuuuu"),
    ("ŵ", "w"),
    ("ýÿŷ", "yyy"),
    ("źżž", "zzz"),
    ("ðþ", "dt"),
]
#: unicode punctuation → ASCII cousin (1:1; NBSP → space).
_PUNCT_PAIRS = [
    ("‘’‚‛", "''''"),
    ("“”„‟", '""""'),
    ("«»", '""'),
    ("‐‑‒–—―", "------"),
    ("…", "."),
    # unicode spaces -> ASCII space (Java/RE2 \\s is ASCII-only, so
    # the collapse regex below never sees these unless folded first):
    # NBSP OGHAM EN-QUAD..HAIR-SPACE LS PS NNBSP MMSP IDEOGRAPHIC.
    (
        "\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006"
        "\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000",
        " " * 18,
    ),
]

ACCENT_SRC = "".join(s for s, _ in _ACCENT_PAIRS)
ACCENT_DST = "".join(d for _, d in _ACCENT_PAIRS)
PUNCT_SRC = "".join(s for s, _ in _PUNCT_PAIRS)
PUNCT_DST = "".join(d for _, d in _PUNCT_PAIRS)
for _s, _d in _ACCENT_PAIRS + _PUNCT_PAIRS:
    assert len(_s) == len(_d), (_s, _d)


def normalize_text(
    col: Column,
    lower: bool = True,
    accents: bool = True,
    digits: bool = True,
    punct: bool = True,
    whitespace: bool = True,
) -> Column:
    """The CCNet canonical form of a text column — one native
    projection (lower → accent fold → punct fold → digits to 0 →
    whitespace collapse + trim), whole-stage codegen end to end."""
    out = col
    if lower:
        out = F.lower(out)
    if accents:
        out = F.translate(out, ACCENT_SRC, ACCENT_DST)
    if punct:
        out = F.translate(out, PUNCT_SRC, PUNCT_DST)
    if digits:
        out = F.regexp_replace(out, "[0-9]", "0")
    if whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_text_sql(
    col: str,
    lower: bool = True,
    accents: bool = True,
    digits: bool = True,
    punct: bool = True,
    whitespace: bool = True,
) -> str:
    """DuckDB twin of :func:`normalize_text` (same fixed tables; note
    DuckDB regexp_replace needs the explicit 'g' flag Spark implies)."""
    out = col
    if lower:
        out = f"lower({out})"
    if accents:
        out = (
            f"translate({out}, {_sql_quote(ACCENT_SRC)}, "
            f"{_sql_quote(ACCENT_DST)})"
        )
    if punct:
        out = (
            f"translate({out}, {_sql_quote(PUNCT_SRC)}, "
            f"{_sql_quote(PUNCT_DST)})"
        )
    if digits:
        out = f"regexp_replace({out}, '[0-9]', '0', 'g')"
    if whitespace:
        out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    return out
