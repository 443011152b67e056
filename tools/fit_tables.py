"""Cellwise comparison of our lattice tables against the golden JSON.

Usage: python tools/fit_tables.py [page_no ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pdf_parser_spark.operators import lattice as X  # noqa: E402
from pdf_parser_spark.pdf import layout as L  # noqa: E402
from pdf_parser_spark.pdf.document import PdfDocument  # noqa: E402

PDF = "/root/reference/Snack_planogram_12_05_2025.pdf"
GOLD = "/root/reference/exports/Snack_planogram_12_05_2025_parsed.json"


def our_tables(doc, pi):
    page = list(doc.pages())[pi]
    runs, segs, rects = L.page_geometry(doc, page)
    o = L.dominant_orientation(runs)
    nr, ns, nrc = L.normalize(runs, segs, o, rects)
    return X.detect_tables(nr, ns, 792, 612, nrc)


def main() -> None:
    pages = [int(a) for a in sys.argv[1:]] or list(range(1, 8))
    g = json.load(open(GOLD))
    doc = PdfDocument(open(PDF, "rb").read())
    total_cells = match_cells = 0
    for pn in pages:
        gold = [t for t in g["tables"] if t["page"] == pn]
        ours = our_tables(doc, pn - 1)
        print("=" * 70)
        print(f"page {pn}: ours {[(t['n_rows'], t['n_cols']) for t in ours]} "
              f"golden {[tuple(t['shape']) for t in gold]}")
        if not gold or not ours:
            continue
        gt = gold[0]
        # choose our table with closest shape
        ot = min(ours, key=lambda t: abs(t["n_rows"] - gt["shape"][0])
                 + abs(t["n_cols"] - gt["shape"][1]))
        grows, orows = gt["rows"], ot["rows"]
        for i in range(max(len(grows), len(orows))):
            gr = grows[i] if i < len(grows) else None
            orow = orows[i] if i < len(orows) else None
            if gr is None or orow is None or gr != orow:
                print(f"  row {i}:")
                print(f"    gold: {gr}")
                print(f"    ours: {orow}")
            if gr is not None and orow is not None:
                for a, b in zip(gr, orow):
                    total_cells += 1
                    if a == b:
                        match_cells += 1
        if gt.get("whitespace") is not None:
            print(f"  whitespace gold={gt['whitespace']} ours={ot['whitespace']}")
    print(f"\ncell match: {match_cells}/{total_cells}")


if __name__ == "__main__":
    main()
