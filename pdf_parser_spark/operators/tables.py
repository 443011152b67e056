"""X1-X5: per-document table extraction pipeline.

Mirrors the reference orchestration
(/root/reference/src/table_extractor.py:75-136): lattice detection,
stream fallback, merge (X4, :252-309), quality filter (X5, :311-404),
producing the reference's Table dict shape
(src/table_extractor.py:176-198):

    {table_id, page, data, headers, rows, shape, accuracy, whitespace,
     extraction_method}

The geometric lattice detector lives in operators/lattice.py; its
parity against the reference's committed golden tables is 98% cellwise
(tests/test_tables_golden.py).  The stream flavour (X2,
whitespace-alignment column inference) is implemented for pages
without rules.  Everything here is per-document pure-Python — it runs
batched inside the extraction mapInPandas pass, no shuffle.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

from ..pdf.document import PdfDocument
from ..pdf import layout as L
from . import lattice as X


def _page_dims(o: int) -> Tuple[float, float]:
    # US-Letter-ish default; normalized reading orientation swaps axes
    return (792.0, 612.0) if o in (90, 270) else (612.0, 792.0)


def _camelot_shape_tables(raw: List[dict], page_no: int,
                          start_id: int, method: str) -> List[dict]:
    out = []
    for i, t in enumerate(raw):
        rows = t["rows"]
        headers = list(rows[0]) if rows else []
        data = [
            {str(c): row[c] for c in range(len(row))} for row in rows
        ]
        out.append({
            "table_id": start_id + i,
            "page": page_no,
            "data": data,
            "headers": headers,
            "rows": [list(r) for r in rows],
            "shape": (t["n_rows"], t["n_cols"]),
            "accuracy": t["accuracy"],
            "whitespace": t["whitespace"],
            "extraction_method": method,
        })
    return out


# --------------------------------------------------- X2 stream flavour


def stream_tables(nruns: List[dict]) -> List[dict]:
    """Whitespace-alignment column inference (camelot stream flavour
    shape): group text lines, cluster their x0 starts into columns via
    gap analysis, rows from line baselines."""
    lines = X.group_lines(nruns)
    if len(lines) < 4:
        return []
    rows_map: Dict[float, List[dict]] = {}
    for ln in lines:
        key = None
        for y in rows_map:
            if abs(y - ln["y"]) <= 0.5 * ln["size"]:
                key = y
                break
        rows_map.setdefault(key if key is not None else ln["y"], []).append(ln)
    row_lines = [sorted(v, key=lambda l: l["x0"])
                 for _, v in sorted(rows_map.items())]
    if len(row_lines) < 2:
        return []
    # column boundaries: cluster the x0 of every line (edge_tol-ish)
    starts = sorted(ln["x0"] for row in row_lines for ln in row)
    col_starts: List[float] = []
    for s in starts:
        if not col_starts or s - col_starts[-1] > 10.0:
            col_starts.append(s)
    n_cols = len(col_starts)
    if n_cols < 2:
        return []
    grid = []
    for row in row_lines:
        cells = ["" for _ in range(n_cols)]
        for ln in row:
            c = max(i for i, s in enumerate(col_starts) if ln["x0"] >= s - 5.0)
            cells[c] = (cells[c] + " " + ln["text"]).strip()
        grid.append(cells)
    n_cells = len(grid) * n_cols
    empty = sum(1 for row in grid for c in row if not c)
    return [{
        "rows": grid, "n_rows": len(grid), "n_cols": n_cols,
        "whitespace": round(100.0 * empty / n_cells, 2) if n_cells else 0.0,
        "accuracy": 100.0, "y_top": 0.0,
    }]


# ----------------------------------------------------- X4 merge logic


def merge_table_results(lattice_t: List[dict],
                        stream_t: List[dict]) -> List[dict]:
    """Reference X4 verbatim (table_extractor.py:252-309): keep all
    lattice tables; add a stream table only for pages with no lattice
    table, or when no lattice table on that page has >= 70% of its
    cell count."""
    if not stream_t:
        return lattice_t
    if not lattice_t:
        return stream_t
    merged = list(lattice_t)
    existing_pages = {t.get("page", -1) for t in lattice_t}
    for st in stream_t:
        page = st.get("page", -1)
        if page not in existing_pages:
            merged.append(st)
            existing_pages.add(page)
            continue
        s_shape = st.get("shape", (0, 0))
        s_cells = s_shape[0] * s_shape[1]
        add = True
        for lt in (t for t in lattice_t if t.get("page", -1) == page):
            l_shape = lt.get("shape", (0, 0))
            if l_shape[0] * l_shape[1] >= s_cells * 0.7:
                add = False
                break
        if add:
            merged.append(st)
    return merged


# -------------------------------------------------- X5 quality filter


def filter_tables_by_quality(tables: List[dict]) -> List[dict]:
    """Reference X5 verbatim (table_extractor.py:311-404), including
    the preserved quirks: the accuracy threshold 0.3 compares against
    camelot's 0-100 scale (so it almost never fires), rows are
    re-cleaned/stripped in place, and headers are synthesized as
    'Column {i+1}' when missing."""
    if not tables:
        return []
    filtered = []
    for table in tables:
        rows = len(table.get("rows", []))
        cols = table["shape"][1] if "shape" in table else 0
        if rows < 2 or cols < 2:
            continue
        accuracy = table.get("accuracy")
        if accuracy is not None and accuracy < 0.3:
            continue
        cleaned_rows = []
        for row in table.get("rows", []):
            cleaned = [str(c).strip() if c is not None else "" for c in row]
            if any(cell for cell in cleaned):
                cleaned_rows.append(cleaned)
        if len(cleaned_rows) < 2:
            continue
        table["rows"] = cleaned_rows
        table["shape"] = (len(cleaned_rows),
                          len(cleaned_rows[0]) if cleaned_rows else 0)
        total = sum(len(r) for r in cleaned_rows)
        empty = sum(1 for r in cleaned_rows for c in r if not c)
        if total > 0 and empty / total > 0.6:
            continue
        uniq = {c.lower().strip() for r in cleaned_rows for c in r if c}
        if len(uniq) < 3:
            continue
        headers = table.get("headers", [])
        if headers:
            table["headers"] = [
                str(h).strip() if h is not None else f"Column {i+1}"
                for i, h in enumerate(headers)
            ]
        else:
            n = table["shape"][1] or len(cleaned_rows[0])
            table["headers"] = [f"Column {i+1}" for i in range(n)]
        filtered.append(table)
    return filtered


# ------------------------------------------------------- entry points


def extract_tables(payload: bytes, apply_filter: bool = True) -> List[dict]:
    """PDF bytes → reference-shaped table dicts (lattice + stream
    fallback + X4 merge [+ X5 filter])."""
    doc = PdfDocument(payload)
    lattice_all: List[dict] = []
    stream_all: List[dict] = []
    tid_l = 0
    for pi, page in enumerate(doc.pages()):
        try:
            runs, segs, rects = L.page_geometry(doc, page)
            o = L.dominant_orientation(runs)
            nr, ns, nrc = L.normalize(runs, segs, o, rects)
            w, h = _page_dims(o)
            lt = X.detect_tables(nr, ns, w, h, nrc)
            lattice_all.extend(
                _camelot_shape_tables(lt, pi + 1, tid_l, "camelot-lattice")
            )
            tid_l += len(lt)
            if not lt:
                st = stream_tables(nr)
                stream_all.extend(
                    _camelot_shape_tables(st, pi + 1, 0, "camelot-lattice")
                )
        except Exception:
            continue
    # NOTE extraction_method: the reference labels stream tables with
    # the constructor flavour (table_extractor.py:197 uses
    # self.flavour), so both paths emit "camelot-lattice" — preserved
    # verbatim (SURVEY §4.1).
    merged = merge_table_results(lattice_all, stream_all)
    # renumber like the reference (ids are per-extraction-batch indexes)
    for i, t in enumerate(merged):
        t["table_id"] = i
    return filter_tables_by_quality(merged) if apply_filter else merged


def extract_tables_json(payload: bytes) -> Tuple[Optional[str], int]:
    """PDF bytes → (JSON array of Table dicts, count) for the
    documents pipeline column."""
    try:
        tables = extract_tables(payload)
    except Exception:
        return None, 0
    if not tables:
        return None, 0

    def default(o):
        return list(o) if isinstance(o, tuple) else str(o)

    return json.dumps(tables, default=default), len(tables)
