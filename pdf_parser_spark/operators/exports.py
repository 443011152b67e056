"""E3-E5 export transforms and X6 display top-k.

Faithful re-expressions of the reference's export-side semantics —
NOT copies; each function cites its behavioral spec and preserves the
documented quirks:

- E3 text→CSV structure (src/csv_exporter.py:112-191): delimiter
  counting over [',','\\t','|',';'] with FIRST-in-list tie-break, a
  literal two-space split fallback, row padding, and the header
  promotion check that is always true for string data (a single-value
  pandas Series of str is object dtype, never numeric).
- E5 text→table inference (src/csv_converter.py:172-576): four
  competing heuristics scored by
  consistency(≤3) + avg-cols(≤3) + numeric-ratio×2 + rows(≤2).
- E4 consolidated best-table choice (src/csv_converter.py:22-91):
  gates ≥3×2 / accuracy ≥0.4 / ≥3 rows / ≥40% content / ≥4 unique,
  sorted by (diversity, content_ratio) desc.
- X6 display filter (app.py:75-150): stricter gates + top-3 by
  (accuracy, cell count, diversity) — also provided as a NATIVE Spark
  window (the reference's only true top-k operator).

Unit parity is asserted in tests/test_exports_parity.py by RUNNING the
reference modules as oracles on synthetic inputs.
"""

from __future__ import annotations

import itertools
import re
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ------------------------------------------------------------------ E3

E3_DELIMITERS = [",", "\t", "|", ";"]


def text_structure(text: str) -> Tuple[List[str], List[List[str]]]:
    """E3: (headers, rows) the reference would write to CSV."""
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    counts = {d: sum(ln.count(d) for ln in lines) for d in E3_DELIMITERS}
    max_count = max(counts.values()) if counts else 0
    best = next((d for d, c in counts.items() if c == max_count), ",")
    if max_count == 0:
        data = []
        for ln in lines:
            row = [c.strip() for c in ln.split("  ") if c.strip()]
            if row:
                data.append(row)
    else:
        data = [[c.strip() for c in ln.split(best)] for ln in lines]
    if not data:
        return [], []
    max_cols = max(len(r) for r in data)
    data = [r + [""] * (max_cols - len(r)) for r in data]
    # header promotion: the reference's numeric check never fires for
    # string cells, so the first row is promoted whenever >1 rows
    if len(data) > 1:
        return data[0], data[1:]
    return [str(i) for i in range(max_cols)], data


# ------------------------------------------------------------------ E5


def _try_fixed_width(lines: List[str]) -> List[List[str]]:
    if not lines or len(lines) < 2:
        return []
    spaces = [
        {i for i, ch in enumerate(ln) if ch.isspace()} for ln in lines[:10]
    ]
    common = spaces[0]
    for s in spaces[1:]:
        common = common & s
    common = sorted(common)
    if not common:
        return []
    bounds = [0] + common + [1000]
    data = []
    for ln in lines:
        if len(ln) < bounds[1]:
            continue
        row = []
        for i in range(len(bounds) - 1):
            start, end = bounds[i], bounds[i + 1]
            if start >= len(ln):
                break
            cell = ln[start:min(end, len(ln))].strip()
            if cell:
                row.append(cell)
        if row:
            data.append(row)
    return data


def _try_delimiters(lines: List[str]) -> List[List[str]]:
    if not lines:
        return []
    delims = [",", "\t", "|", ":", ";", "  "]
    best_delim, best_score = None, 0
    for d in delims:
        total, consistent, prev = 0, True, -1
        for ln in lines[:20]:
            c = ln.count(d)
            total += c
            if prev >= 0 and c > 0 and c != prev:
                consistent = False
            if c > 0:
                prev = c
        score = total * (2 if consistent else 1)
        if score > best_score:
            best_score, best_delim = score, d
    if best_delim and best_score > 10:
        data = []
        for ln in lines:
            if best_delim == "  ":
                row = [c.strip() for c in ln.split("  ") if c.strip()]
            else:
                row = [c.strip() for c in ln.split(best_delim) if c.strip()]
            if row:
                data.append(row)
        return data
    return []


def _try_line_grouping(lines: List[str]) -> List[List[str]]:
    if not lines:
        return []
    data, current, pattern_count = [], [], 0
    for ln in lines:
        is_header = (
            len(ln) < 40 or ln.isupper() or ln.endswith(":")
            or all(w[0].isupper() for w in ln.split() if w)
        )
        has_numbers = any(c.isdigit() for c in ln)
        if is_header and current:
            data.append(current)
            current, pattern_count = [ln], 0
        elif has_numbers and pattern_count > 0:
            current.append(ln)
            pattern_count += 1
        else:
            if current:
                data.append(current)
            current, pattern_count = [ln], 1
    if current:
        data.append(current)
    return data


def _try_patterns(lines: List[str]) -> List[List[str]]:
    if not lines or len(lines) < 3:
        return []

    def pat(ln):
        out = []
        for c in ln:
            out.append("d" if c.isdigit() else
                       "a" if c.isalpha() else
                       "s" if c.isspace() else "o")
        return "".join(a for a, _ in itertools.groupby(out))

    groups: Dict[str, List[int]] = {}
    for i, ln in enumerate(lines):
        groups.setdefault(pat(ln), []).append(i)
    largest = max(groups.values(), key=len)
    if len(largest) < 3:
        return []
    sample = [lines[i] for i in largest[:5]]
    best_delim, max_score = None, 0
    for d in [",", "\t", "  ", "|", ";", ":"]:
        split_lines = []
        for ln in sample:
            if d == "  ":
                parts = [p for p in re.split(r"\s{2,}", ln) if p.strip()]
            else:
                parts = [p.strip() for p in ln.split(d) if p.strip()]
            split_lines.append(parts)
        cc = [len(p) for p in split_lines]
        if cc and all(c == cc[0] for c in cc) and cc[0] > 1:
            score = cc[0] * len(split_lines)
            if score > max_score:
                max_score, best_delim = score, d
    if best_delim:
        out = []
        for i in largest:
            ln = lines[i]
            if best_delim == "  ":
                parts = [p for p in re.split(r"\s{2,}", ln) if p.strip()]
            else:
                parts = [p.strip() for p in ln.split(best_delim) if p.strip()]
            out.append(parts)
        return out
    space_sets = [{i for i, c in enumerate(ln) if c.isspace()} for ln in sample]
    common = space_sets[0]
    for s in space_sets[1:]:
        common = common & s
    if common:
        common = sorted(common)
        out = []
        for i in largest:
            ln = lines[i]
            start, parts = 0, []
            for si in common:
                if si > start:
                    part = ln[start:si].strip()
                    if part:
                        parts.append(part)
                start = si + 1
            if start < len(ln):
                part = ln[start:].strip()
                if part:
                    parts.append(part)
            if parts:
                out.append(parts)
        return out
    return []


def score_table_structure(data: List[List[str]]) -> float:
    """E5 scorer (src/csv_converter.py:395-454) verbatim semantics."""
    if not data:
        return 0.0
    n = len(data)
    if n <= 1:
        return 1.0
    cc = [len(r) for r in data]
    if all(c == cc[0] for c in cc):
        consistency = 3.0
    else:
        avg = sum(cc) / len(cc)
        var = sum((c - avg) ** 2 for c in cc) / len(cc)
        consistency = max(0.0, 3.0 - var / 5.0)
    avg_cols = sum(cc) / len(cc)
    cols_score = min(3.0, avg_cols / 2.0)
    cells = sum(cc)
    numeric = sum(1 for r in data for c in r if re.search(r"\d", c))
    content = (numeric / cells * 2.0) if cells else 0.0
    rows_score = min(2.0, n / 10.0)
    return consistency + cols_score + content + rows_score


def text_to_table(text: str) -> List[List[str]]:
    """E5: best-scoring table structure for raw text
    (src/csv_converter.py:172-236), padded to rectangular."""
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    best_data, best_score = None, 0.0
    for fn in (_try_fixed_width, _try_delimiters, _try_line_grouping,
               _try_patterns):
        data = fn(lines)
        if data and len(data) > 1:
            s = score_table_structure(data)
            if s > best_score:
                best_score, best_data = s, data
    data = best_data if best_data else [[ln] for ln in lines]
    if not data or len(data) <= 1 or all(len(r) <= 1 for r in data):
        data = [[ln] for ln in lines]
    max_cols = max((len(r) for r in data), default=0)
    for r in data:
        r.extend([""] * (max_cols - len(r)))
    return data


# ------------------------------------------------------------------ E2


def format_table(table: dict) -> Tuple[List[str], List[List[str]]]:
    """E2 table formatting (src/csv_exporter.py:63-110) as the cell
    strings pandas would write: headers (or Column_N), empty-row/col
    drop, the astype(str) 'None' artifact for empty cells in partially
    filled rows, and the >50%-numeric column cast (int64 render when
    no gaps, float render otherwise, '' for unparseable cells)."""
    headers = table.get("headers", [])
    rows = table.get("rows", [])
    if not rows:
        return [], []
    n_cols = max(len(r) for r in rows)
    grid: List[List[Optional[str]]] = [
        [(r[c] if c < len(r) else None) for c in range(n_cols)] for r in rows
    ]
    cols = (list(headers) if headers and len(headers) == n_cols
            else [f"Column_{i+1}" for i in range(n_cols)])
    # '' -> None; drop all-None rows, then all-None columns
    grid = [[None if c == "" else c for c in row] for row in grid]
    grid = [row for row in grid if any(c is not None for c in row)]
    keep = [j for j in range(n_cols)
            if any(row[j] is not None for row in grid)]
    cols = [cols[j] for j in keep]
    grid = [[row[j] for j in keep] for row in grid]
    # astype(str).strip(): None renders as the literal 'None'
    grid = [[("None" if c is None else str(c).strip()) for c in row]
            for row in grid]
    grid = [[("" if c == "nan" else c) for c in row] for row in grid]

    def to_num(s: str) -> Optional[float]:
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    n_rows = len(grid)
    for j in range(len(cols)):
        vals = [to_num(grid[i][j]) for i in range(n_rows)]
        non_na = [v for v in vals if v is not None]
        if not non_na or len(non_na) / n_rows <= 0.5:
            continue
        has_na = len(non_na) < n_rows
        all_int = all(float(v).is_integer() for v in non_na)
        for i in range(n_rows):
            v = vals[i]
            if v is None:
                grid[i][j] = ""
            elif all_int and not has_na:
                grid[i][j] = str(int(v))
            else:
                grid[i][j] = repr(v)
    return cols, grid


def render_csv(columns: Sequence[str], rows: Sequence[Sequence[str]]) -> str:
    """QUOTE_MINIMAL CSV text, matching pandas to_csv(index=False)."""
    import csv as _csv
    import io

    buf = io.StringIO()
    w = _csv.writer(buf, quoting=_csv.QUOTE_MINIMAL, lineterminator="\n")
    w.writerow(columns)
    for r in rows:
        w.writerow(r)
    return buf.getvalue()


def export_tables_to_csv(tables: List[dict],
                         base_filename: str) -> Dict[str, str]:
    """E2 fan-out (src/csv_exporter.py:17-61): filename → CSV text;
    a single table drops the _table_N suffix."""
    out: Dict[str, str] = {}
    if not tables:
        return out
    if len(tables) == 1:
        cols, rows = format_table(tables[0])
        out[f"{base_filename}.csv"] = render_csv(cols, rows)
        return out
    for i, t in enumerate(tables):
        cols, rows = format_table(t)
        out[f"{base_filename}_table_{i+1}.csv"] = render_csv(cols, rows)
    return out


# ------------------------------------------------------------------ E1


def export_tables_raw_csv(tables: List[dict],
                          base_filename: str) -> Dict[str, str]:
    """E1 extractor-side CSV (src/table_extractor.py:406-439): one
    file per table named {base}_table_{i+1}.csv (ALWAYS suffixed —
    unlike E2's single-table drop), csv.writer DEFAULTS ('\\r\\n' line
    endings, QUOTE_MINIMAL), a headers row when present, and rows
    written raw — none of E2's 'None'/numeric-cast formatting."""
    import csv as _csv
    import io

    out: Dict[str, str] = {}
    for i, table in enumerate(tables or []):
        buf = io.StringIO()
        w = _csv.writer(buf)  # default lineterminator = '\r\n'
        headers = table.get("headers", [])
        if headers:
            w.writerow(headers)
        for row in table.get("rows", []):
            w.writerow(row)
        out[f"{base_filename}_table_{i+1}.csv"] = buf.getvalue()
    return out


# ------------------------------------------------------------------ E7


def export_result_as_csvs(result: dict, base_filename: str) -> Dict[str, str]:
    """E7 fan-out (src/csv_exporter.py:193-242): a ParseResult dict →
    {filename: csv text} covering tables (E2), the full text (E3), and
    each non-empty chunk (E3; empty chunks skipped per :233)."""
    out: Dict[str, str] = {}
    tables = result.get("tables")
    if isinstance(tables, list):
        out.update(export_tables_to_csv(tables, base_filename))
    text = result.get("text")
    if text:
        headers, rows = text_structure(text)
        out[f"{base_filename}_text.csv"] = render_csv(headers, rows)
    chunks = result.get("chunks")
    if isinstance(chunks, list):
        for i, chunk in enumerate(chunks):
            if isinstance(chunk, str) and chunk.strip():
                headers, rows = text_structure(chunk)
                out[f"{base_filename}_chunk_{i+1}_text.csv"] = render_csv(
                    headers, rows)
    return out


# ------------------------------------------------------------------ E6


def render_result_json(result: dict) -> str:
    """E6 JSON sink (src/cli.py:16-38, duplicated app.py:56-73):
    serialize the ParseResult with ``indent=2, default=str``, dropping
    the non-serializable ``langchain_docs`` entry."""
    import json as _json

    clean = {k: v for k, v in result.items() if k != "langchain_docs"}
    return _json.dumps(clean, indent=2, default=str)


# ------------------------------------------------------------------ E4


def select_best_table(tables: List[dict]) -> Optional[dict]:
    """E4 best-table choice (src/csv_converter.py:42-80)."""
    quality = []
    for i, t in enumerate(tables or []):
        rows = t.get("rows", [])
        shape = t.get("shape", (0, 0))
        accuracy = t.get("accuracy", 1.0)
        if not (shape[0] >= 3 and shape[1] >= 2
                and (accuracy is not None and accuracy >= 0.4)
                and len(rows) >= 3):
            continue
        uniq, non_empty, total = set(), 0, 0
        for row in rows:
            for cell in row:
                total += 1
                s = str(cell).strip() if cell else ""
                if s:
                    non_empty += 1
                    uniq.add(s.lower())
        ratio = non_empty / total if total else 0
        if ratio >= 0.4 and len(uniq) >= 4:
            quality.append((i, t, len(uniq), ratio))
    if not quality:
        return None
    quality.sort(key=lambda x: (x[2], x[3]), reverse=True)
    return quality[0][1]


# ------------------------------------------------------------------ X6

_HEADER_WORDS = ["column", "header", "title", "name", "field", "table"]


def filter_tables_for_display(tables: List[dict]) -> List[dict]:
    """X6 (app.py:75-150): display-quality gate + top-3."""
    filtered = []
    for t in tables or []:
        shape = t.get("shape", (0, 0))
        rows = t.get("rows", [])
        accuracy = t.get("accuracy", 1.0)
        if shape[0] < 2 or shape[1] < 2:
            continue
        if accuracy is not None and accuracy < 0.4:
            continue
        if not rows or len(rows) < 2:
            continue
        non_empty, total, uniq = 0, 0, set()
        for row in rows:
            for cell in row:
                total += 1
                s = str(cell).strip() if cell else ""
                if s:
                    non_empty += 1
                    uniq.add(s.lower())
        if total == 0 or non_empty / total < 0.4:
            continue
        if len(uniq) < 4:
            continue
        header_like = 0
        for row in rows:
            content = [str(c).strip().lower() for c in row if str(c).strip()]
            if any(w in c for c in content for w in _HEADER_WORDS):
                header_like += 1
        if header_like > len(rows) / 2:
            continue
        filtered.append(t)
    filtered.sort(key=lambda t: (
        t.get("accuracy", 0),
        t.get("shape", (0, 0))[0] * t.get("shape", (0, 0))[1],
        len({str(c).strip().lower() for r in t.get("rows", [])
             for c in r if str(c).strip()}),
    ), reverse=True)
    return filtered[:3]


def display_top3_native(tables_df: DataFrame) -> DataFrame:
    """X6 as a NATIVE Spark plan over a flat tables DataFrame
    (url, table_id, accuracy, n_rows, n_cols, n_unique, content_ratio
    [, header_like_ratio]): filter gates + row_number window — partial
    aggregation and a single shuffle on url; this is the plan shape a
    100 TB tables corpus wants (no per-doc Python).

    The header-word gate (app.py:119-131: reject when more than half
    the rows contain 'column'/'header'/'title'/...) is applied when the
    stats contract carries `header_like_ratio` (header-like rows /
    total rows — computable natively from exploded rows with
    higher-order `exists` over _HEADER_WORDS); absent that column only
    the numeric gates apply."""
    gates = (
        (F.col("n_rows") >= 2) & (F.col("n_cols") >= 2)
        & (F.col("accuracy") >= 0.4)
        & (F.col("content_ratio") >= 0.4)
        & (F.col("n_unique") >= 4)
    )
    if "header_like_ratio" in tables_df.columns:
        gates = gates & (F.col("header_like_ratio") <= 0.5)
    w = Window.partitionBy("url").orderBy(
        F.desc("accuracy"),
        F.desc(F.col("n_rows") * F.col("n_cols")),
        F.desc("n_unique"),
        F.asc("table_id"),
    )
    return (
        tables_df
        .where(gates)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )


def header_like_ratio_col(rows_col: str = "rows"):
    """Native header_like_ratio over an array<array<string>> rows
    column: fraction of rows where any cell contains a header word
    (app.py:119-126 semantics — cells lowercased+stripped, empty cells
    ignored)."""
    def _any_header_word(cell):
        cond = F.lit(False)
        for wd in _HEADER_WORDS:
            cond = cond | cell.contains(wd)
        return cond

    def row_is_headerish(row):
        return F.exists(
            F.filter(row, lambda c: F.trim(c) != ""),
            lambda c: _any_header_word(F.lower(F.trim(c))),
        )

    rows = F.col(rows_col)
    n = F.size(rows)
    n_headerish = F.size(F.filter(rows, row_is_headerish))
    return F.when(n > 0, n_headerish / n).otherwise(F.lit(0.0))


# ------------------------------------------------------------------ X7

_HTML_TRUE_WORDS = ("yes", "true", "active", "enabled", "pass")
_HTML_FALSE_WORDS = ("no", "false", "inactive", "disabled", "fail")


def table_html(table: dict) -> str:
    """X7 table→HTML render (spec: table_extractor.py:441-521,
    `get_table_html`), faithful re-expression with the reference's
    quirks preserved:

    - empty ``rows`` short-circuits to the warning alert BEFORE any
      header handling;
    - missing headers auto-name as 'Column i+1' from row 0's width;
    - per-cell class is decided on the UNESCAPED text: Python
      ``float()`` over the text with ','/'$'/'%' stripped decides
      numeric (so 'nan'/'infinity' classify numeric), '$' beats '%'
      on the ORIGINAL cell, truthy/falsy word lists, the >50-char
      text-wrap tier, 'text-start' default;
    - only &<> are escaped, AFTER classification;
    - rows alternate 'table-light'/'' starting light.

    Presentation-only in the reference (Flask display route); here it
    doubles as a sink format — `tables_html` in the gate renders the
    dict through this exact function on executors."""
    headers = table.get("headers", [])
    rows = table.get("rows", [])
    if not rows:
        return ('<div class="alert alert-warning">'
                "No data available for this table</div>")
    out = [
        '<div class="table-responsive">',
        '<table class="table table-bordered table-hover '
        'table-striped table-sm">',
    ]
    if not headers:
        headers = [f"Column {i + 1}" for i in range(len(rows[0]))]
    if headers:
        out.append('<thead class="table-dark">')
        out.append("<tr>")
        for h in headers:
            ht = str(h).strip() or "Column"
            out.append(f'<th class="text-center fw-bold">{ht}</th>')
        out.append("</tr>")
        out.append("</thead>")
    out.append("<tbody>")
    for i, row in enumerate(rows):
        row_class = "table-light" if i % 2 == 0 else ""
        out.append(f'<tr class="{row_class}">')
        for cell in row:
            cell_text = str(cell).strip() if cell is not None else ""
            try:
                float(cell_text.replace(",", "").replace("$", "")
                      .replace("%", ""))
                cell_class = "text-end fw-semibold"
                if "$" in str(cell):
                    cell_class += " text-success"
                elif "%" in str(cell):
                    cell_class += " text-info"
            except (ValueError, TypeError):
                low = cell_text.lower()
                if low in _HTML_TRUE_WORDS:
                    cell_class = "text-success fw-semibold"
                elif low in _HTML_FALSE_WORDS:
                    cell_class = "text-danger fw-semibold"
                elif len(cell_text) > 50:
                    cell_class = "text-wrap"
                else:
                    cell_class = "text-start"
            cell_text = (cell_text.replace("&", "&amp;")
                         .replace("<", "&lt;").replace(">", "&gt;"))
            out.append(f'<td class="{cell_class}">{cell_text}</td>')
        out.append("</tr>")
    out.append("</tbody>")
    out.append("</table>")
    out.append("</div>")
    return "".join(out)
