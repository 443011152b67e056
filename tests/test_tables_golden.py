"""X1-X5 golden parity: our geometric lattice pipeline vs the
reference's committed camelot output
(/root/reference/exports/Snack_planogram_12_05_2025_parsed.json).

The golden corresponds to the raw camelot stage (its rows include
all-empty rows that the current reference quality filter would drop),
so the parity comparison runs with apply_filter=False.

Known deviations (root-caused rounds 2-5; see operators/lattice.py
and pdf/layout.py): pages 2/6 carry planogram art. The round-1
mystery ("extra art rows/cols camelot somehow dropped") is SOLVED —
the art's internal shelf rules are painted under W/W* CLIP regions
and opaque product-image XObjects; honoring clips (axis-aligned) and
image overpaint in the geometry extractor removes them exactly as
the raster does, and the art mega-cell text matches the golden
byte-for-byte. Round 5 closed the two header families (20 of the 22
residue cells): (a) the row-1 LAYOUT|SEGMENT border piece is offset
0.48-0.72 pt from the lower rows' border, so camelot's erosion
kernel measures its 19.9 pt length alone and drops it — emulated by
the RASTER_TOL collinearity stage in detect_rules; (b) text-to-
column assignment follows camelot get_table_index's largest-
relative-overlap rule, not x0 (the Description|Facings cells).

What remains (2 cells + the pages-2/6 shapes, golden (7,4) vs our
(6,3)): one phantom all-empty column and row per art page. The
round-3 measurement FALSIFIED bbox dilation (grid geometry identical
across pages 1/2/6, test_dilation_margin_falsified pins it); the
round-5 raster emulation (tools/raster_probe.py: draw-ordered
render, camelot's inverted-gray adaptive threshold, dim/15
morphological opening) CONFIRMS the mechanism — the product images'
pixel CONTENT contributes edge lines under adaptive thresholding,
and on pages 2/6 those edges align into the extra bounds — but the
exact surviving line positions depend on ghostscript's smooth JPEG
scaling, which a nearest-neighbor emulation reproduces only to
within a few px (the probe finds the mechanism's lines plus
doubled-edge artifacts the real raster merges). Hence a >= 0.99
cellwise threshold (measured 1656/1658 = 99.88%) rather than
equality, with exact-shape assertions on the five clean pages.
"""

import json
import os

import pytest

PDF = "/root/reference/Snack_planogram_12_05_2025.pdf"
GOLD = "/root/reference/exports/Snack_planogram_12_05_2025_parsed.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PDF), reason="reference fixtures unavailable"
)


@pytest.fixture(scope="module")
def golden():
    with open(GOLD) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ours():
    from pdf_parser_spark.operators.tables import extract_tables

    with open(PDF, "rb") as f:
        return extract_tables(f.read(), apply_filter=False)


def test_one_table_per_page(ours, golden):
    assert len(golden["tables"]) == 7
    by_page = {}
    for t in ours:
        by_page.setdefault(t["page"], []).append(t)
    # the five structurally clean pages detect exactly one table
    for p in (1, 3, 4, 5, 7):
        assert len(by_page.get(p, [])) == 1, p


def test_shapes_exact_on_clean_pages(ours, golden):
    gold_by_page = {t["page"]: t for t in golden["tables"]}
    our_by_page = {t["page"]: t for t in ours}
    for p in (1, 3, 4, 5, 7):
        assert tuple(our_by_page[p]["shape"]) == tuple(
            gold_by_page[p]["shape"]), p


def test_whitespace_metric_on_big_tables(ours, golden):
    gold_by_page = {t["page"]: t for t in golden["tables"]}
    our_by_page = {t["page"]: t for t in ours}
    for p in (3, 5, 7):
        assert abs(our_by_page[p]["whitespace"]
                   - gold_by_page[p]["whitespace"]) < 0.01, p


def test_cellwise_parity(ours, golden):
    total = match = 0
    our_by_page = {}
    for t in ours:
        our_by_page.setdefault(t["page"], t)
    for gt in golden["tables"]:
        ot = our_by_page.get(gt["page"])
        assert ot is not None
        for gr, orow in zip(gt["rows"], ot["rows"]):
            for a, b in zip(gr, orow):
                total += 1
                match += a == b
    assert total > 1500
    # 1656/1658 as of round 5 (only the pages-2/6 phantom empty
    # col/row remain); regression guard at the achieved level
    assert match / total >= 0.99, f"cell parity {match}/{total}"


def test_headers_equal_first_row(ours):
    for t in ours:
        if t["rows"]:
            assert t["headers"] == t["rows"][0]


def test_filter_and_merge_semantics():
    from pdf_parser_spark.operators.tables import (
        filter_tables_by_quality, merge_table_results,
    )

    def mk(page, rows, acc=95.0):
        return {"page": page, "rows": rows,
                "shape": (len(rows), len(rows[0]) if rows else 0),
                "headers": rows[0] if rows else [], "accuracy": acc}

    # X5: tiny tables dropped
    assert filter_tables_by_quality([mk(1, [["a", "b"]])]) == []
    # X5: empty rows removed, shape updated
    t = mk(1, [["a", "b"], ["", ""], ["c", "d"]])
    out = filter_tables_by_quality([t])
    assert out and out[0]["shape"] == (2, 2)
    # X5: low diversity dropped (<3 unique values)
    assert filter_tables_by_quality(
        [mk(1, [["x", "x"], ["x", "x"]])]) == []
    # X5 quirk: accuracy 0.3 threshold on a 0-100 scale almost never
    # fires (reference table_extractor.py:338) — 1.0 passes
    keep = filter_tables_by_quality([mk(1, [["a", "b"], ["c", "d"]], acc=1.0)])
    assert len(keep) == 1
    # X4: stream table skipped when lattice has >=70% of its cells
    lat = [mk(1, [["a", "b"], ["c", "d"]])]          # 4 cells
    stream = [mk(1, [["1", "2"], ["3", "4"]])]       # 4 cells -> skip
    assert merge_table_results(lat, stream) == lat
    # X4: stream added on new pages
    s2 = [mk(2, [["1", "2"], ["3", "4"]])]
    assert len(merge_table_results(lat, s2)) == 2


def test_dilation_margin_falsified():
    """Round-3 measurement for the 22-cell residue (module docstring):
    the emitted region's grid geometry is IDENTICAL across page 1
    (golden (6,3)) and pages 2/6 (golden (7,4)) to within the joint
    tolerance, so no region-bbox dilation margin can reproduce the
    golden difference. If this identity ever breaks (a geometry change
    separates the pages), the dilation route is worth revisiting —
    this test is the tripwire."""
    from pdf_parser_spark.operators import lattice as X
    from pdf_parser_spark.pdf import layout as L
    from pdf_parser_spark.pdf.document import PdfDocument

    doc = PdfDocument(open(PDF, "rb").read())
    grids = {}
    for pi in (0, 1, 5):
        page = list(doc.pages())[pi]
        runs, segs, rects = L.page_geometry(doc, page)
        o = L.dominant_orientation(runs)
        nr, ns, nrc = L.normalize(runs, segs, o, rects)
        w, h = 792, 612
        hs, vs = X.detect_rules(ns, w / X.LINE_SCALE, h / X.LINE_SCALE,
                                nrc)
        hs, vs = X._clip_rules(hs, vs, w, h, w / X.LINE_SCALE,
                               h / X.LINE_SCALE)
        comps = X._components(hs, vs)
        # the emitted region = the page-spanning component (what
        # nesting suppression keeps; detect_tables output shape (6,3))
        best = max(comps, key=lambda c: X._bbox(*c)[2] - X._bbox(*c)[0])
        jx, jy = X._joints(*best)
        x0, y0, x1, y1 = X._bbox(*best)
        grids[pi + 1] = (X._cluster(jx + [x0, x1]),
                         X._cluster(jy + [y0, y1]))
    for pn in (2, 6):
        for ours, ref in zip(grids[pn], grids[1]):
            assert len(ours) == len(ref)
            assert all(abs(a - b) <= X.SNAP_TOL
                       for a, b in zip(ours, ref)), (pn, ours, ref)
