"""Offline separator-policy fitting: capture per-show device matrices
once, then replay candidate crlf/space policies and score against the
golden text. Run after setting T.TRACE capture in text.py.

Usage: python tools/fit_policy.py
"""

from __future__ import annotations

import difflib
import json
import math
import pickle
import sys

sys.path.insert(0, ".")

from pdf_parser_spark.functions.clean import clean_text  # noqa: E402
from pdf_parser_spark.pdf import text as T  # noqa: E402
from pdf_parser_spark.pdf.document import PdfDocument  # noqa: E402

PDF = "/root/reference/Snack_planogram_12_05_2025.pdf"
GOLD = "/root/reference/exports/Snack_planogram_12_05_2025_parsed.json"
CACHE = "/tmp/show_trace.pkl"


def capture():
    data = open(PDF, "rb").read()
    doc = PdfDocument(data)
    pages = []
    for page in doc.pages():
        T.TRACE = tr = []
        T.extract_page_text(doc, page)
        T.TRACE = None
        shows = [e[2] for e in tr if e[0] == "show"]
        # image-Do newline markers: record as sentinel events in order
        evs = []
        for k, p, i in tr:
            if k in ("show", "imgdo"):
                evs.append((k, i))
        pages.append(evs)
    pickle.dump(pages, open(CACHE, "wb"))
    return pages


def orient(m):
    if m[3] > 1e-6:
        return 0
    if m[3] < -1e-6:
        return 180
    if m[1] > 0:
        return 90
    return 270


def replay(pages, policy):
    """policy(prev_info, cur_info, last_char) -> '' | '\\n' | ' '"""
    parts = []
    for evs in pages:
        out = []
        prev = None
        for kind, info in evs:
            last = out[-1][-1] if out and out[-1] else (
                parts[-1][-1] if parts and parts[-1] else "")
            if kind == "imgdo":
                if last != "\n" and (out or parts):
                    out.append("\n")
                continue
            sep = ""
            if prev is not None:
                sep = policy(prev, info, last)
            out.append(sep + info["piece"])
            prev = info
        parts.append("".join(out))
    return "".join(p + "\n" for p in parts)


def pypdf_policy(nl_coef=0.8, sp_band=0.3, sp_coef=15.0,
                 orient_of="prev", nl_abs=False):
    def p(prev, cur, last):
        m_prev, m = prev["m"], cur["m"]
        o = orient(m_prev if orient_of == "prev" else m)
        dx = m[4] - m_prev[4]
        dy = m[5] - m_prev[5]
        k = math.sqrt(abs(m[0] * m[3]) + abs(m[1] * m[2]))
        f = cur["fs"] * k
        sw = cur["sw"]
        if o == 0:
            d_line, d_read = dy, dx
            nl = d_line < -nl_coef * f
        elif o == 180:
            d_line, d_read = dy, dx
            nl = d_line > nl_coef * f
        elif o == 90:
            d_line, d_read = dx, dy
            nl = d_line > nl_coef * f
        else:
            d_line, d_read = dx, dy
            nl = d_line < -nl_coef * f
        if nl_abs:
            nl = abs(d_line) > nl_coef * f
        if nl:
            return "\n" if last != "\n" else ""
        if abs(d_line) < f * sp_band and abs(d_read) > sw * f * sp_coef:
            return " " if last != " " else ""
        return ""
    return p


def score(pages, policy, verbose=False, name=""):
    golden = json.load(open(GOLD))["text"]
    mine = clean_text(replay(pages, policy))
    sm = difflib.SequenceMatcher(None, mine, golden, autojunk=False)
    ops = [o for o in sm.get_opcodes() if o[0] != "equal"]
    nbad = sum(max(i2 - i1, j2 - j1) for _, i1, i2, j1, j2 in ops)
    print(f"{name}: {len(ops)} diff sites, {nbad} chars, "
          f"len {len(mine)} vs {len(golden)}")
    if verbose:
        for tag, i1, i2, j1, j2 in ops[:12]:
            print(f"  {tag} mine={mine[max(0,i1-20):i2+20]!r} "
                  f"gold={golden[max(0,j1-20):j2+20]!r}")
    return len(ops)


def main():
    import os
    if os.path.exists(CACHE) and "--fresh" not in sys.argv:
        pages = pickle.load(open(CACHE, "rb"))
    else:
        pages = capture()
    score(pages, pypdf_policy(), name="pypdf-default", verbose=True)
    score(pages, pypdf_policy(orient_of="cur"), name="orient-cur")


if __name__ == "__main__":
    main()
