"""Dump the full operator-event window spanning each golden-separator
miss site (from 3 shows before to 3 shows after the boundary)."""

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
    doc = PdfDocument(data)
    trace: list = []
    parts = []
    offset = 0
    for page in doc.pages():
        T.TRACE = page_trace = []
        t = T.extract_page_text(doc, page)
        T.TRACE = None
        trace.extend((k, p + offset, i) for k, p, i in page_trace)
        parts.append(t)
        offset += len(t) + 1  # '\n' page joint
    raw = "".join(p + "\n" for p in parts)
    mine = clean_text(raw)
    golden = json.load(open(GOLD))["text"]

    # map cleaned index -> raw index (clean only deletes chars, so a
    # linear simulation gives the exact map)
    import re
    steps = [(re.compile(r"\n+"), "\n"), (re.compile(r" +"), " "),
             (re.compile(r"[^\x00-\x7F]+"), "")]
    # build map by running the pipeline with per-char provenance
    idx = list(range(len(raw)))
    cur = raw
    for rx, rep in steps:
        out_chars, out_idx = [], []
        last = 0
        for m in rx.finditer(cur):
            out_chars.append(cur[last:m.start()])
            out_idx.extend(idx[last:m.start()])
            if rep:
                out_chars.append(rep)
                out_idx.append(idx[m.start()])
            last = m.end()
        out_chars.append(cur[last:])
        out_idx.extend(idx[last:])
        cur = "".join(out_chars)
        idx = out_idx
    # strip
    lstrip = len(cur) - len(cur.lstrip())
    cur2 = cur.strip()
    idx = idx[lstrip:lstrip + len(cur2)]
    assert cur2 == mine, (len(cur2), len(mine))

    show_idx = [k for k, e in enumerate(trace) if e[0] == "show"]
    sm = difflib.SequenceMatcher(None, mine, golden, autojunk=False)
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            continue
        rpos = idx[i1] if i1 < len(idx) else len(raw)
        print("=" * 78)
        print(f"{tag} missing={golden[j1:j2]!r} "
              f"after={mine[max(0,i1-16):i1]!r} next={golden[j2:j2+10]!r} "
              f"rawpos={rpos}")
        before = [k for k in show_idx if trace[k][1] < rpos]
        after = [k for k in show_idx if trace[k][1] >= rpos]
        lo = before[-3] if len(before) >= 3 else 0
        hi = after[2] if len(after) >= 3 else len(trace) - 1
        for kind, pos, info in trace[lo:hi + 1]:
            print(f"  @{pos} {kind} {info if kind != 'show' else repr(info)}")


if __name__ == "__main__":
    main()
