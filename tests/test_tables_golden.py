"""X1-X5 golden parity: our geometric lattice pipeline vs the
reference's committed camelot output
(/root/reference/exports/Snack_planogram_12_05_2025_parsed.json).

The golden corresponds to the raw camelot stage (its rows include
all-empty rows that the current reference quality filter would drop),
so the parity comparison runs with apply_filter=False.

Known deviations (root-caused round 2; see operators/lattice.py and
pdf/layout.py): pages 2/6 carry planogram art. The round-1 mystery
("extra art rows/cols camelot somehow dropped") is SOLVED — the art's
internal shelf rules are painted under W/W* CLIP regions and opaque
product-image XObjects; honoring clips (axis-aligned) and image
overpaint in the geometry extractor removes them exactly as the
raster does, and the art mega-cell text now matches the golden
byte-for-byte. What remains is camelot-raster-only: (a) its region
bbox comes from contours of the DILATED line mask, landing just past
the joint-cluster tolerance on the art pages and adding one skinny
EMPTY last row/column ((7,4) vs our (6,3)) — the same offset merges
within tolerance on fully-ruled pages, and the two ranges overlap in
vector space, so it cannot be reproduced without the raster; (b) one
row-1 cell-border difference on the art header. Hence a >= 0.95
cellwise threshold (measured 1636/1658 = 98.7%) rather than equality,
with exact-shape assertions on the five structurally clean pages.
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
    assert match / total >= 0.95, f"cell parity {match}/{total}"


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
