"""Deterministic synthetic PDF writer (classic xref, PDF 1.7).

Produces the same *class* of document as the reference fixtures
(/root/reference/Snack_planogram_12_05_2025.pdf, rei-8727.pdf — both
classic-xref PDF 1.7, FlateDecode, simple fonts; verified by byte scan
in SURVEY.md §5): Helvetica WinAnsi text shown with Td/Tj, optional
vector-ruled table grids drawn with re/m/l/S strokes, so the lattice
table detector (SURVEY X1) has honest synthetic inputs.

Everything is driven by an explicit seed — no timestamps, no ids —
so the same call yields identical bytes forever (bench + golden safe).
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Sequence, Tuple

PAGE_W, PAGE_H = 612, 792  # US Letter


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(
    lines: Sequence[str],
    table: Optional[Tuple[Sequence[str], Sequence[Sequence[str]]]] = None,
    font_size: int = 11,
    leading: int = 14,
    draw_rules: bool = True,
) -> bytes:
    """Content stream: one Tj per text line, then an optional table —
    ruled (vector-stroke grid, lattice flavour) or rule-free aligned
    cell text (whitespace-alignment, stream flavour)."""
    out: List[str] = ["BT", f"/F1 {font_size} Tf", f"1 0 0 1 72 {PAGE_H - 72} Tm"]
    for ln in lines:
        out.append(f"({_esc(ln)}) Tj")
        out.append(f"0 -{leading} Td")
    out.append("ET")

    if table is not None:
        headers, rows = table
        ncols = len(headers)
        nrows = len(rows) + 1
        x0, col_w, row_h = 72.0, min(110.0, 468.0 / max(1, ncols)), 18.0
        y_top = PAGE_H - 72 - leading * (len(lines) + 2)
        y0 = y_top - row_h * nrows
        x1 = x0 + col_w * ncols
        if draw_rules:
            # grid rules as vector strokes (what camelot's lattice
            # flavour detects from the rasterized page; we detect them
            # geometrically)
            out.append("0.75 w")
            for r in range(nrows + 1):
                y = y_top - row_h * r
                out.append(f"{x0:.1f} {y:.1f} m {x1:.1f} {y:.1f} l S")
            for c in range(ncols + 1):
                x = x0 + col_w * c
                out.append(f"{x:.1f} {y0:.1f} m {x:.1f} {y_top:.1f} l S")
        # cell text
        for r, row in enumerate([list(headers)] + [list(r) for r in rows]):
            y = y_top - row_h * r - 13
            for c, cell in enumerate(row[:ncols]):
                x = x0 + col_w * c + 3
                out.append("BT")
                out.append(f"/F1 9 Tf 1 0 0 1 {x:.1f} {y:.1f} Tm")
                out.append(f"({_esc(str(cell))}) Tj")
                out.append("ET")
    return "\n".join(out).encode("latin-1")


def build_pdf(
    pages: Sequence[Sequence[str]],
    tables: Optional[dict] = None,
    info: Optional[dict] = None,
    draw_rules: bool = True,
) -> bytes:
    """Assemble a classic-xref PDF.

    pages: list of pages, each a list of text lines.
    tables: {page_index: (headers, rows)} cell grids to draw —
            vector-ruled when draw_rules (lattice detector input),
            aligned text only otherwise (stream detector input).
    info:   /Info dictionary string fields (Title, Producer, ...).
    """
    tables = tables or {}
    objs: List[bytes] = []  # 1-indexed

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_n = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    page_nums: List[int] = []
    content_nums: List[int] = []
    for i, lines in enumerate(pages):
        raw = _page_stream(lines, tables.get(i), draw_rules=draw_rules)
        comp = zlib.compress(raw, 9)
        content_nums.append(
            add(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(comp), comp)
            )
        )
    pages_n_placeholder = len(objs) + len(pages) + 1
    for i in range(len(pages)):
        page_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (pages_n_placeholder, PAGE_W, PAGE_H, font_n, content_nums[i])
            )
        )
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    pages_n = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(pages))
    )
    assert pages_n == pages_n_placeholder
    catalog_n = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_n)
    info_n = None
    if info:
        body = b"<<"
        for k, v in sorted(info.items()):
            body += b" /%s (%s)" % (k.encode(), _esc(str(v)).encode("latin-1"))
        body += b" >>"
        info_n = add(body)

    buf = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i
        buf += body
        buf += b"\nendobj\n"
    xref_pos = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    trailer = b"trailer\n<< /Size %d /Root %d 0 R" % (len(objs) + 1, catalog_n)
    if info_n:
        trailer += b" /Info %d 0 R" % info_n
    trailer += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    buf += trailer
    return bytes(buf)
