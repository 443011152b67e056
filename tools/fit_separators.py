"""Golden-parity fitting tool: locate every separator the golden has
that our extractor misses (and vice versa), and dump the extractor
events (matrix jumps, shows) around each site.

Usage: python tools/fit_separators.py [context_chars]
"""

from __future__ import annotations

import difflib
import json
import sys

sys.path.insert(0, ".")

from pdf_parser_spark.functions.clean import clean_text  # noqa: E402
from pdf_parser_spark.pdf import text as T  # noqa: E402
from pdf_parser_spark.pdf.document import PdfDocument  # noqa: E402

PDF = "/root/reference/Snack_planogram_12_05_2025.pdf"
GOLD = "/root/reference/exports/Snack_planogram_12_05_2025_parsed.json"


def main() -> None:
    data = open(PDF, "rb").read()
    T.TRACE = trace = []
    raw = T.extract_document_text(data)
    T.TRACE = None
    mine = clean_text(raw)
    golden = json.load(open(GOLD))["text"]
    print(f"mine={len(mine)} golden={len(golden)}")

    sm = difflib.SequenceMatcher(None, mine, golden, autojunk=False)
    sites = []
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag != "equal":
            sites.append((tag, i1, i2, j1, j2))
    print(f"{len(sites)} diff sites")

    for tag, i1, i2, j1, j2 in sites:
        ctx = mine[max(0, i1 - 24):i1]
        missing = golden[j1:j2] if tag in ("insert", "replace") else ""
        extra = mine[i1:i2] if tag in ("delete", "replace") else ""
        # find the context in RAW text (clean collapses \n+ and ' +', so
        # match loosely: strip spaces/newlines for the search key)
        key = ctx[-16:]
        rpos = raw.find(key)
        nxt = golden[j2:j2 + 12]
        print("=" * 78)
        print(f"{tag}: missing={missing!r} extra={extra!r} after={ctx[-30:]!r} "
              f"next={nxt!r} rawpos={rpos}")
        if rpos < 0:
            continue
        lo, hi = rpos - 2, rpos + len(key) + 30
        ev = [e for e in trace if lo <= e[1] <= hi]
        for kind, pos, info in ev[:30]:
            print(f"  @{pos} {kind} {info if kind != 'show' else repr(info)}")


if __name__ == "__main__":
    main()
