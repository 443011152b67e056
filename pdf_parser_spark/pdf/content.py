"""Content-stream tokenizer: yields (operands, operator) tuples.

Reuses the COS object parser for operands; operators are bare
keyword tokens.  Inline images (BI…ID…EI) are skipped wholesale.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

from .objects import DELIMITERS, WHITESPACE, parse_object, skip_ws

_OPCHARS = set(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ*'\"01"
)


def tokenize(data: bytes) -> Iterator[Tuple[List, bytes]]:
    pos = 0
    n = len(data)
    operands: List = []
    while pos < n:
        pos = skip_ws(data, pos)
        if pos >= n:
            break
        c = data[pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or c in b"+-.0123456789":
            try:
                # content streams carry no indirect references
                # (ISO 32000-1 §7.8.2): skip the "N gen R" lookahead
                obj, pos = parse_object(data, pos, allow_ref=False)
            except ValueError:
                pos += 1
                continue
            operands.append(obj)
            continue
        # operator token
        start = pos
        while pos < n and data[pos] in _OPCHARS:
            pos += 1
        if pos == start:
            pos += 1  # unknown byte, skip
            continue
        op = data[start:pos]
        if op == b"BI":
            # inline image: skip to EI bounded by whitespace
            m = re.search(rb"\sEI(?=[\s/\[\]<>(]|$)", data[pos:])
            pos = pos + m.end() if m else n
            operands = []
            continue
        if op in (b"true", b"false", b"null"):
            operands.append(op == b"true")
            continue
        yield operands, op
        operands = []
