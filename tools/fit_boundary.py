"""Collect every show-pair that crosses a cm operation (where tier-1
separator checks reset), compute device-space deltas, and label each
with the separator the GOLDEN text has at that boundary. Then we can
fit a threshold rule for the sandwich tier.

The current extractor output misses exactly the golden separators at
some of these boundaries and has no spurious ones, so labels come from
aligning current output to golden.
"""

from __future__ import annotations

import difflib
import json
import math
import sys
from collections import Counter

sys.path.insert(0, ".")

from pdf_parser_spark.functions.clean import clean_text  # noqa: E402
from pdf_parser_spark.pdf import text as T  # noqa: E402
from pdf_parser_spark.pdf.document import PdfDocument  # noqa: E402

PDF = "/root/reference/Snack_planogram_12_05_2025.pdf"
GOLD = "/root/reference/exports/Snack_planogram_12_05_2025_parsed.json"


def orient(m):
    if m[3] > 1e-6:
        return 0
    if m[3] < -1e-6:
        return 180
    if m[1] > 0:
        return 90
    return 270


def main() -> None:
    data = open(PDF, "rb").read()
    doc = PdfDocument(data)
    trace = []
    parts = []
    offset = 0
    for pi, page in enumerate(doc.pages()):
        T.TRACE = tr = []
        t = T.extract_page_text(doc, page)
        T.TRACE = None
        trace.extend((k, p + offset, i) for k, p, i in tr)
        parts.append(t)
        offset += len(t) + 1
    raw = "".join(p + "\n" for p in parts)
    mine = clean_text(raw)
    golden = json.load(open(GOLD))["text"]

    # cleaned->raw index map (clean deletes chars only)
    import re
    steps = [(re.compile(r"\n+"), "\n"), (re.compile(r" +"), " "),
             (re.compile(r"[^\x00-\x7F]+"), "")]
    idx = list(range(len(raw)))
    cur = raw
    for rx, rep in steps:
        oc, oi, last = [], [], 0
        for mm in rx.finditer(cur):
            oc.append(cur[last:mm.start()])
            oi.extend(idx[last:mm.start()])
            if rep:
                oc.append(rep)
                oi.append(idx[mm.start()])
            last = mm.end()
        oc.append(cur[last:])
        oi.extend(idx[last:])
        cur, idx = "".join(oc), oi
    ls = len(cur) - len(cur.lstrip())
    idx = idx[ls:ls + len(cur.strip())]

    # golden-missing separators -> raw positions
    miss = {}  # raw_pos -> sep char
    sm = difflib.SequenceMatcher(None, mine, golden, autojunk=False)
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            continue
        assert tag == "insert", (tag, mine[i1:i2], golden[j1:j2])
        miss[idx[i1] if i1 < len(idx) else len(raw)] = golden[j1:j2]

    # raw positions where the RAW OUTPUT already has a separator right
    # before this position (tier-1 emitted, golden agrees) → a tier-2
    # fire would be absorbed by the last-char guard
    def already_sep(rp: int) -> bool:
        k = rp - 1
        while k >= 0 and raw[k] in " \n":
            return True
        return False

    # boundaries: consecutive shows with >=1 cm between them
    events = [(k, p, i) for k, p, i in trace if k in ("show", "cm", "BT", "ET", "Tf")]
    prev_show = None
    between = set()
    rows = []
    for k, p, i in events:
        if k != "show":
            between.add(k)
            continue
        if prev_show is not None and "cm" in between:
            m_prev, m = prev_show["m"], i["m"]
            o = orient(m_prev)
            dx, dy = m[4] - m_prev[4], m[5] - m_prev[5]
            kk = math.sqrt(abs(m[0] * m[3]) + abs(m[1] * m[2]))
            f = i["fs"] * kk
            if o in (0, 180):
                d_line, d_read = dy if o == 0 else -dy, dx
            else:
                d_line, d_read = dx if o == 90 else -dx, dy
            sep = miss.get(p, "")
            label = "MUST" if sep else ("FREE" if already_sep(p) else "NOT")
            rows.append((sep, label, o, round(d_line, 1), round(d_read, 1),
                         round(f, 2), i["sw"], prev_show["piece"][-6:],
                         i["piece"][:6], p))
        prev_show = i
        between = set()

    c = Counter(r[1] for r in rows)
    print(f"{len(rows)} cm-crossing boundaries: {dict(c)}")
    print("\n-- MUST fire (the missing separators) --")
    for r in rows:
        if r[1] == "MUST":
            print(r)
    print("\n-- hardest NOT-fire (by |d_line|/f) --")
    nos = [r for r in rows if r[1] == "NOT"]
    nos.sort(key=lambda r: -abs(r[3]) / r[5])
    for r in nos[:12]:
        print(r)
    print("\n-- hardest NOT-fire (by |d_read|/(f*sw), d_line small) --")
    nos2 = [r for r in rows if r[1] == "NOT" and abs(r[3]) < 0.3 * r[5]]
    nos2.sort(key=lambda r: -abs(r[4]) / (r[5] * max(r[6], 0.01)))
    for r in nos2[:12]:
        print(r)


if __name__ == "__main__":
    main()
