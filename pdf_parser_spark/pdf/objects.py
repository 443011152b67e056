"""PDF COS object lexer/parser (from scratch, PDF 32000-1:2008 §7.3).

Parses the eight basic object types out of a ``bytes`` buffer:
booleans, numbers, literal/hex strings, names, arrays, dictionaries,
streams and the null object, plus indirect references ``N G R``.

Names are represented as ``Name`` (a ``str`` subclass) so they compare
equal to plain strings but are distinguishable when re-serializing.
Strings are ``bytes`` (PDF strings are byte strings; text-decoding is a
font/metadata concern, not a lexing concern).

Reference behavior spec: pypdf's generic object model as exercised by
/root/reference/src/pdf_parser.py:97,152 (PdfReader).  Implementation
is original, written against the PDF spec.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"


class Name(str):
    """A PDF name object (the leading ``/`` is stripped)."""

    __slots__ = ()


class IndirectRef:
    """An indirect reference ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:
        return f"IndirectRef({self.num},{self.gen})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, IndirectRef)
            and self.num == other.num
            and self.gen == other.gen
        )

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class StreamObject:
    """A stream: its dictionary plus raw (still-encoded) bytes."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.dict = d
        self.raw = raw


def skip_ws(data: bytes, pos: int) -> int:
    """Advance past whitespace and %-comments."""
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in WHITESPACE:
            pos += 1
        elif c == 0x25:  # '%' comment to EOL
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


#: run of regular name characters (everything but ws/delimiters) —
#: the C regex scanner replaces the per-byte loop on the hot path
_NAME_RUN_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")


def _parse_name(data: bytes, pos: int) -> Tuple[Name, int]:
    # data[pos] == '/'
    pos += 1
    m = _NAME_RUN_RE.match(data, pos)
    seg = m.group()
    if b"#" not in seg:
        return Name(seg.decode("latin-1")), m.end()
    # rare '#xx' escapes: byte-exact slow path (same semantics as the
    # original loop, incl. the pos+2 < n guard quirk)
    n = len(data)
    out = bytearray()
    while pos < n:
        c = data[pos]
        if c in WHITESPACE or c in DELIMITERS:
            break
        if c == 0x23 and pos + 2 < n:  # '#xx' escape
            try:
                out.append(int(data[pos + 1 : pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return Name(out.decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int) -> Tuple[bytes, int]:
    # data[pos] == '('
    pos += 1
    n = len(data)
    out = bytearray()
    depth = 1
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                pos += 1
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # lone backslash: drop it
                out.append(e)
                pos += 1
        elif c == 0x28:  # '('
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:  # ')'
            depth -= 1
            if depth == 0:
                pos += 1
                break
            out.append(c)
            pos += 1
        elif c == 0x0D:  # CR or CRLF -> LF per spec
            out.append(10)
            pos += 1
            if pos < n and data[pos] == 0x0A:
                pos += 1
        else:
            out.append(c)
            pos += 1
    return bytes(out), pos


def _parse_hex_string(data: bytes, pos: int) -> Tuple[bytes, int]:
    # data[pos] == '<' (and next is not '<')
    pos += 1
    n = len(data)
    digits = bytearray()
    while pos < n and data[pos] != 0x3E:  # '>'
        c = data[pos]
        if c not in WHITESPACE:
            digits.append(c)
        pos += 1
    pos += 1  # skip '>'
    if len(digits) % 2:
        digits.append(0x30)  # pad with '0'
    try:
        return bytes.fromhex(digits.decode("ascii")), pos
    except ValueError:
        return b"", pos


_NUMCHARS = b"+-.0123456789"


def parse_object(data: bytes, pos: int,
                 allow_ref: bool = True) -> Tuple[Any, int]:
    """Parse one object at ``pos``; returns (object, next_pos).

    Streams are NOT consumed here (``stream`` keyword follows the dict);
    the document layer handles that because stream length may be an
    indirect reference.

    ``allow_ref=False`` (content streams, where indirect references
    cannot occur — ISO 32000-1 §7.8.2) skips the "N gen R" lookahead
    that otherwise runs two extra whitespace+digit scans after EVERY
    non-negative integer; TJ arrays are full of them.
    """
    pos = skip_ws(data, pos)
    if pos >= len(data):
        raise ValueError("EOF while parsing object")
    c = data[pos]
    if c == 0x2F:  # '/'
        return _parse_name(data, pos)
    if c == 0x28:  # '('
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # '<'
        if data[pos : pos + 2] == b"<<":
            return _parse_dict(data, pos, allow_ref)
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # '['
        return _parse_array(data, pos, allow_ref)
    # numbers FIRST — by far the most frequent leaf in content
    # streams; the keyword startswith-probes only run for letters
    if c in _NUMCHARS:
        return _parse_number_or_ref(data, pos, allow_ref)
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    raise ValueError(f"unexpected byte {bytes([c])!r} at {pos}")


_NUM_RUN_RE = re.compile(rb"[+\-.0-9]+")


def _parse_number_or_ref(data: bytes, pos: int,
                         allow_ref: bool = True) -> Tuple[Any, int]:
    n = len(data)
    m = _NUM_RUN_RE.match(data, pos)
    pos = m.end()
    tok = m.group()
    if b"." in tok:
        try:
            return float(tok), pos
        except ValueError:
            return 0.0, pos
    try:
        value = int(tok)
    except ValueError:
        return 0, pos
    # Lookahead for "gen R" making this an indirect reference.
    if allow_ref and value >= 0:
        p2 = skip_ws(data, pos)
        start2 = p2
        while p2 < n and 0x30 <= data[p2] <= 0x39:
            p2 += 1
        if p2 > start2:
            gen_tok = data[start2:p2]
            p3 = skip_ws(data, p2)
            if p3 < n and data[p3] == 0x52:  # 'R'
                after = p3 + 1
                if after >= n or data[after] in WHITESPACE or data[after] in DELIMITERS:
                    return IndirectRef(value, int(gen_tok)), after
    return value, pos


def _parse_array(data: bytes, pos: int,
                 allow_ref: bool = True) -> Tuple[list, int]:
    pos += 1  # '['
    out = []
    n = len(data)
    while True:
        pos = skip_ws(data, pos)
        if pos >= n:
            break
        if data[pos] == 0x5D:  # ']'
            pos += 1
            break
        obj, pos = parse_object(data, pos, allow_ref)
        out.append(obj)
    return out, pos


def _parse_dict(data: bytes, pos: int,
                allow_ref: bool = True) -> Tuple[dict, int]:
    pos += 2  # '<<'
    out: dict = {}
    n = len(data)
    while True:
        pos = skip_ws(data, pos)
        if pos >= n:
            break
        if data[pos : pos + 2] == b">>":
            pos += 2
            break
        if data[pos] != 0x2F:
            # Malformed dict entry: skip a token defensively.
            try:
                _, pos = parse_object(data, pos, allow_ref)
            except ValueError:
                pos += 1
            continue
        key, pos = _parse_name(data, pos)
        pos = skip_ws(data, pos)
        value, pos = parse_object(data, pos, allow_ref)
        out[key] = value
    return out, pos
