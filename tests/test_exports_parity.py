"""E3/E4/E5 parity: run the REFERENCE modules (imported dynamically
from /root/reference, never copied) as behavioral oracles on synthetic
inputs and assert our re-expressions produce the same structures."""

import csv
import importlib.util
import os

import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SRC), reason="reference unavailable"
)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_SRC, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_exporter():
    return _load("csv_exporter").CSVExporter


@pytest.fixture(scope="module")
def ref_converter():
    return _load("csv_converter").CSVConverter


TEXTS = [
    "name,age,city\nalice,30,berlin\nbob,25,paris\ncarol,41,rome",
    "a|b|c\n1|2|3\n4|5|6",
    "col1\tcol2\nfoo\tbar\nbaz\tqux",
    "name  age  city\nalice  30  berlin\nbob  25  paris",
    "just some prose text\nwith plain lines\nand nothing tabular",
    "Item: 5; Price: 3\nItem: 6; Price: 9\nItem: 7; Price: 2",
    "x,y\n1,2\n3,4\n5,6\n7,8\n9,10\n11,12",
]


def _read_csv(path):
    with open(path, newline="", encoding="utf-8-sig") as f:
        return [row for row in csv.reader(f)]


def test_e3_text_structure_matches_reference(ref_exporter, tmp_path):
    from pdf_parser_spark.operators.exports import text_structure

    for i, text in enumerate(TEXTS):
        out = str(tmp_path / f"e3_{i}")
        path = ref_exporter.export_text_as_csv(text, out, "t")
        got = _read_csv(path)
        headers, rows = text_structure(text)
        assert got[0] == headers, (i, got[0], headers)
        assert got[1:] == rows, (i, got[1:], rows)


def test_e5_text_to_table_matches_reference(ref_converter, tmp_path):
    from pdf_parser_spark.operators.exports import text_to_table

    for i, text in enumerate(TEXTS):
        out = str(tmp_path / f"e5_{i}")
        path = ref_converter.text_to_table(text, out, "t")
        got = _read_csv(path)
        ours = text_to_table(text)
        # reference writes Column_N headers then the data region
        assert got[0] == [f"Column_{k+1}" for k in range(len(ours[0]))], i
        assert got[1:] == ours, (i, got[1:], ours)


def _mk_table(rows, acc=95.0, page=1):
    return {"page": page, "rows": rows, "headers": rows[0] if rows else [],
            "shape": (len(rows), len(rows[0]) if rows else 0),
            "accuracy": acc, "data": []}


def test_e4_best_table_matches_reference(ref_converter, tmp_path):
    from pdf_parser_spark.operators.exports import select_best_table

    tables = [
        _mk_table([["a", "b"], ["c", "d"]]),                        # too small
        _mk_table([["h1", "h2"], ["v1", "v2"], ["v3", "v4"]]),      # 3x2 ok
        _mk_table([["x1", "x2", "x3"], ["y1", "y2", "y3"],
                   ["z1", "z2", "z3"], ["w1", "w2", "w3"]]),        # richer
    ]
    pdf_data = {"tables": tables, "text": "irrelevant"}
    path = ref_converter.convert_pdf_to_csv(pdf_data, str(tmp_path), "t")
    got = _read_csv(path)
    best = select_best_table(tables)
    assert best is tables[2]
    # reference writes the chosen table's data; its first data row must
    # come from the same table we chose
    flat = [c for row in got for c in row]
    assert "x1" in flat or "y1" in flat


def test_e2_table_csv_matches_reference(ref_exporter, tmp_path):
    from pdf_parser_spark.operators.exports import export_tables_to_csv

    cases = [
        # plain strings
        [_mk_table([["h1", "h2"], ["a", "b"], ["c", "d"]])],
        # numeric-majority column -> cast; gap -> float render
        [_mk_table([["name", "qty"], ["x", "1"], ["y", "2"], ["z", ""]])],
        # all-int numeric column, no gaps
        [_mk_table([["k", "n"], ["a", "10"], ["b", "20"], ["c", "30"]])],
        # empty row dropped; partial empties
        [_mk_table([["c1", "c2"], ["", ""], ["v", ""]])],
        # two tables -> suffixed files
        [_mk_table([["p", "q"], ["1", "2"]]),
         _mk_table([["r", "s"], ["3", "4"]])],
    ]
    for i, tables in enumerate(cases):
        out = str(tmp_path / f"e2_{i}")
        paths = ref_exporter.export_tables_to_csv(tables, out, "t")
        ours = export_tables_to_csv(tables, "t")
        assert sorted(os.path.basename(p) for p in paths) == sorted(ours), i
        for p in paths:
            with open(p, encoding="utf-8-sig", newline="") as f:
                ref_text = f.read()
            assert ref_text == ours[os.path.basename(p)], (i, p)


def test_e7_json_roundtrip_matches_reference(ref_exporter, tmp_path):
    import json as _json

    from pdf_parser_spark.operators.exports import export_result_as_csvs

    result = {
        "text": "name,age\nalice,30\nbob,25",
        "chunks": ["", "name,age\nalice,30"],
        "tables": [
            _mk_table([["h1", "h2"], ["a", "b"], ["c", "d"]]),
            _mk_table([["x", "y"], ["1", "2"], ["3", "4"]]),
        ],
        "metadata": {"num_pages": 1},
        "num_chunks": 2,
    }
    jpath = str(tmp_path / "doc.json")
    with open(jpath, "w") as f:
        _json.dump(result, f)
    out = str(tmp_path / "csvs")
    paths = ref_exporter.export_raw_json_as_csv(jpath, out)
    ours = export_result_as_csvs(result, "doc")
    assert sorted(os.path.basename(p) for p in paths) == sorted(ours)
    for p in paths:
        with open(p, encoding="utf-8-sig", newline="") as f:
            assert f.read() == ours[os.path.basename(p)], p


def test_x6_display_filter_spec():
    from pdf_parser_spark.operators.exports import filter_tables_for_display

    good = _mk_table([["q1", "q2"], ["r1", "r2"], ["s1", "s2"]], acc=90)
    low_acc = _mk_table([["a1", "a2"], ["b1", "b2"], ["c1", "c2"]], acc=0.2)
    header_like = _mk_table(
        [["column one", "column two"], ["header a", "header b"],
         ["title c", "name d"]], acc=95)
    out = filter_tables_for_display([good, low_acc, header_like])
    assert out == [good]
    # top-3 cap, sorted by accuracy
    many = [
        _mk_table([[f"a{i}", f"b{i}"], [f"c{i}", f"d{i}"]], acc=50 + i)
        for i in range(5)
    ]
    out = filter_tables_for_display(many)
    assert len(out) == 3
    assert [t["accuracy"] for t in out] == [54, 53, 52]


def test_write_table_csvs_job(spark, tmp_path):
    """E1/E2 distributed writer: fixture PDF → one CSV per golden
    table, formatted byte-identically to the reference's writer."""
    from pdf_parser_spark.jobs.export_csv import write_table_csvs
    from pdf_parser_spark.jobs.extract import extract_documents

    pdf = "/root/reference/Snack_planogram_12_05_2025.pdf"
    with open(pdf, "rb") as f:
        payload = f.read()
    pages = spark.createDataFrame([("snack", payload)],
                                  "url string, html binary")
    docs = extract_documents(pages, partitions=2)
    out = str(tmp_path / "csvs")
    manifest = write_table_csvs(docs, out).collect()
    assert len(manifest) >= 5  # filtered tables for the planogram
    for r in manifest:
        path = os.path.join(out, r.filename)
        assert os.path.exists(path)
        with open(path, encoding="utf-8-sig") as f:
            body = f.read()
        assert len(body) == r.n_bytes
        assert "," in body.splitlines()[0] or body.splitlines()[0]


def test_x6_native_matches_python(spark):
    from pdf_parser_spark.operators.exports import (
        display_top3_native, filter_tables_for_display,
    )

    rows = []
    tables = []
    for d in range(3):
        for i in range(5):
            t = _mk_table(
                [[f"a{d}{i}", f"b{d}{i}"], [f"c{d}{i}", f"d{d}{i}"],
                 [f"e{d}{i}", f"f{d}{i}"]], acc=60 + i + d)
            tables.append((f"doc{d}", i, t))
            uniq = {c for r in t["rows"] for c in r}
            rows.append((f"doc{d}", i, float(t["accuracy"]),
                         t["shape"][0], t["shape"][1], len(uniq), 1.0))
    df = spark.createDataFrame(
        rows,
        "url string, table_id int, accuracy double, n_rows int, "
        "n_cols int, n_unique int, content_ratio double",
    )
    native = {
        (r.url, r.table_id)
        for r in display_top3_native(df).collect()
    }
    for d in range(3):
        per_doc = [t for (u, i, t) in tables if u == f"doc{d}"]
        keep = filter_tables_for_display(per_doc)
        ids = {
            (f"doc{d}", i) for (u, i, t) in tables
            if u == f"doc{d}" and t in keep
        }
        assert ids == {p for p in native if p[0] == f"doc{d}"}


def test_detector_crash_contained(monkeypatch):
    """X3-outcome parity: when the lattice detector crashes on a page,
    the reference falls through its latent stream_tables NameError to
    the tabula fallback and typically yields NO tables
    (/root/reference/src/table_extractor.py:95-114); our engine must
    produce the same OUTCOME — page skipped, no exception."""
    from pdf_parser_spark.datagen.pdfgen import build_pdf
    from pdf_parser_spark.operators import tables as T

    def boom(*a, **k):
        raise RuntimeError("detector crash")

    monkeypatch.setattr(T.X, "detect_tables", boom)
    pdf = build_pdf([["some text"]], {0: (["a", "b"], [["c", "d"]])}, {})
    assert T.extract_tables(pdf) == []


def test_e1_raw_csv_matches_reference(tmp_path):
    """E1 byte-parity vs the RUNNING reference
    (table_extractor.py:406-439): csv.writer defaults, headers row,
    always-suffixed filenames."""
    import sys
    import types

    # the reference module imports PIL at top level (unused by the
    # E1 method under test); satisfy the import with a stub
    if "PIL" not in sys.modules:
        pil = types.ModuleType("PIL")
        pil.Image = types.SimpleNamespace()
        sys.modules["PIL"] = pil
    te_mod = _load("table_extractor")
    ref = te_mod.TableExtractor.__new__(te_mod.TableExtractor)

    from pdf_parser_spark.operators.exports import export_tables_raw_csv

    tables = [
        {"headers": ["h1", "h2"], "rows": [["a", "b"], ["c,d", "e"]]},
        {"headers": [], "rows": [["only", "rows"]]},
        {"headers": ["q\"uote", "n"], "rows": [["x", "1"]]},
    ]
    paths = ref.save_tables_to_csv(tables, str(tmp_path), "doc")
    ours = export_tables_raw_csv(tables, "doc")
    assert sorted(os.path.basename(p) for p in paths) == sorted(ours)
    for p in paths:
        with open(p, newline="", encoding="utf-8") as f:
            assert f.read() == ours[os.path.basename(p)], p


# ------------------------------------------------------------------ X7


@pytest.fixture(scope="module")
def ref_table_html():
    """The reference's get_table_html run as a standalone behavioral
    oracle. table_extractor.py imports PIL/camelot at module scope
    (absent here), so the method is AST-extracted from the class and
    exec'd with only the stdlib it actually touches — still the
    reference's OWN code running, never a copy."""
    import ast

    src = open(os.path.join(REF_SRC, "table_extractor.py")).read()
    tree = ast.parse(src)
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and \
                node.name == "get_table_html":
            fn = node
            break
    assert fn is not None
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"Dict": dict}
    exec(compile(ast.fix_missing_locations(mod),
                 "table_extractor.py", "exec"), ns)
    return lambda table: ns["get_table_html"](None, table)


X7_TABLES = [
    # full planogram-style table with every class branch
    {"headers": ["A", "B", ""], "rows": [
        ["plain", "$1,234.50", "45%"],
        ["yes", "no", "TRUE"],
        ["Active", "fail", "x" * 60],
        ["<b>&amp;", "nan", "infinity"],
        ["", None, "-3.5e2"],
        ["1_000", "inf", "  padded  "],
    ]},
    # headerless: Column i+1 autonaming
    {"headers": [], "rows": [["a", "12"], ["b", "$9"]]},
    # empty rows: alert branch (headers ignored)
    {"headers": ["X"], "rows": []},
    # blank header promotes to 'Column'
    {"headers": ["  ", "ok"], "rows": [["1", "2"]]},
]


def test_x7_table_html_matches_reference(ref_table_html):
    from pdf_parser_spark.operators.exports import table_html

    for i, t in enumerate(X7_TABLES):
        assert table_html(t) == ref_table_html(t), i


def test_x7_table_html_matches_reference_on_planogram(ref_table_html):
    """Byte parity over every REAL extracted planogram table."""
    from pdf_parser_spark.operators.exports import table_html
    from pdf_parser_spark.operators.tables import extract_tables

    pdf = open("/root/reference/Snack_planogram_12_05_2025.pdf",
               "rb").read()
    tables = extract_tables(pdf, apply_filter=False)
    assert len(tables) == 7
    for t in tables:
        ours = table_html({"headers": t["headers"], "rows": t["rows"]})
        ref = ref_table_html({"headers": t["headers"], "rows": t["rows"]})
        assert ours == ref and ours.startswith('<div class="table-resp')
