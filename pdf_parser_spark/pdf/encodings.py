"""Simple-font encoding tables (PDF 32000-1:2008 Annex D) and a compact
Adobe Glyph List subset for /Differences resolution.

Only the glyphs that matter post-cleaning (ASCII survives, everything
else is stripped by the reference's ``_clean_text``,
/root/reference/src/pdf_parser.py:138) need to be exact; non-ASCII
mappings are best-effort.
"""

from __future__ import annotations

from functools import lru_cache

# Adobe StandardEncoding: ASCII range is identity except the quotes.
_STD_OVERRIDES = {
    0x27: "’",  # quoteright
    0x60: "‘",  # quoteleft
    0xA4: "/",       # fraction slash area differs; best-effort beyond ASCII
}

# WinAnsiEncoding is cp1252; MacRomanEncoding is mac_roman.


@lru_cache(maxsize=8)
def base_encoding_map(name: str) -> dict[int, str]:
    """Memoized (3 distinct names exist): per-FONT rebuilds of the
    256-entry codec tables showed up at ~30% of the single-thread
    extraction profile on mixed crawl corpora. Callers copy before
    mutating (fonts.py does `dict(base)`)."""
    out: dict[int, str] = {}
    if name == "MacRomanEncoding":
        for c in range(256):
            try:
                out[c] = bytes([c]).decode("mac_roman")
            except UnicodeDecodeError:
                pass
    elif name == "StandardEncoding":
        for c in range(32, 127):
            out[c] = chr(c)
        out.update(_STD_OVERRIDES)
    else:  # WinAnsiEncoding and the default for unknown names
        for c in range(256):
            try:
                out[c] = bytes([c]).decode("cp1252")
            except UnicodeDecodeError:
                out[c] = chr(c) if c < 128 else ""
    return out


# Compact Adobe Glyph List subset: the names that show up in Western
# text PDFs' /Differences arrays.  uniXXXX names are handled in code.
AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "fi": "ﬁ", "fl": "ﬂ",
    "florin": "ƒ", "fraction": "⁄", "minus": "−",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™", "cent": "¢", "sterling": "£",
    "yen": "¥", "Euro": "€", "section": "§",
    "paragraph": "¶", "middot": "·", "periodcentered": "·",
    "multiply": "×", "divide": "÷", "plusminus": "±",
    "nbspace": " ", "exclamdown": "¡", "questiondown": "¿",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ae": "æ", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î",
    "idieresis": "ï", "ntilde": "ñ", "ograve": "ò",
    "oacute": "ó", "ocircumflex": "ô", "otilde": "õ",
    "odieresis": "ö", "oslash": "ø", "ugrave": "ù",
    "uacute": "ú", "ucircumflex": "û", "udieresis": "ü",
    "yacute": "ý", "ydieresis": "ÿ", "germandbls": "ß",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Ntilde": "Ñ", "Ograve": "Ò",
    "Oacute": "Ó", "Ocircumflex": "Ô", "Otilde": "Õ",
    "Odieresis": "Ö", "Oslash": "Ø", "Ugrave": "Ù",
    "Uacute": "Ú", "Ucircumflex": "Û", "Udieresis": "Ü",
    "Yacute": "Ý", "oe": "œ", "OE": "Œ",
    "scaron": "š", "Scaron": "Š", "zcaron": "ž",
    "Zcaron": "Ž", "dotlessi": "ı", "circumflex": "ˆ",
    "tilde": "˜", "macron": "¯", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "cedilla": "¸",
    "hungarumlaut": "˝", "ogonek": "˛", "caron": "ˇ",
    "brokenbar": "¦", "currency": "¤", "dieresis": "¨",
    "acute": "´", "mu": "µ", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "ordfeminine": "ª",
    "ordmasculine": "º", "logicalnot": "¬",
    "softhyphen": "­", "macron": "¯", "eth": "ð",
    "Eth": "Ð", "thorn": "þ", "Thorn": "Þ",
}


def glyph_to_unicode(name: str) -> str:
    if name in AGL:
        return AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return ""
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return ""
    if len(name) == 1:
        return name
    # gXX / cidXX style names carry no unicode semantics
    return ""
