"""PDF 1.5+ features: cross-reference streams and compressed object
streams (type-2 entries) — absent from the reference fixtures but
ubiquitous in real crawls, so the from-scratch parser must handle
them."""

import struct
import zlib


def _mk_objstm_pdf() -> bytes:
    content = b"BT /F1 12 Tf 72 700 Td (modern pdf works) Tj ET"
    cs = zlib.compress(content)
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def put(num, raw):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + raw + b"\nendobj\n")

    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    put(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>")
    put(6, b"<< /Length " + str(len(cs)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + cs + b"\nendstream")
    # objects 4 and 5 live compressed inside object stream 7
    o4 = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    o5 = b"<< /Dummy true >>"
    hdr = b"4 0 5 " + str(len(o4) + 1).encode() + b" "
    comp = zlib.compress(hdr + o4 + b" " + o5)
    put(7, b"<< /Type /ObjStm /N 2 /First " + str(len(hdr)).encode() +
           b" /Length " + str(len(comp)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream")

    def row(t, f2, f3):
        return bytes([t]) + struct.pack(">I", f2) + bytes([f3])

    rows = [row(0, 0, 0)]
    for n in (1, 2, 3):
        rows.append(row(1, offsets[n], 0))
    rows.append(row(2, 7, 0))   # obj 4 -> objstm 7 idx 0
    rows.append(row(2, 7, 1))   # obj 5 -> objstm 7 idx 1
    rows.append(row(1, offsets[6], 0))
    rows.append(row(1, offsets[7], 0))
    xref_off = len(out)
    rows.append(row(1, xref_off, 0))
    data = zlib.compress(b"".join(rows))
    out.extend(b"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 1] /Root 1 0 R "
               b"/Length " + str(len(data)).encode() +
               b" /Filter /FlateDecode >>\nstream\n" + data +
               b"\nendstream\nendobj\n")
    out.extend(b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n")
    return bytes(out)


def test_xref_stream_and_objstm():
    from pdf_parser_spark.pdf.metadata import extract_metadata
    from pdf_parser_spark.pdf.text import extract_document_text

    pdf = _mk_objstm_pdf()
    assert extract_document_text(pdf) == "modern pdf works\n"
    assert extract_metadata(pdf)["num_pages"] == "1"


def test_extract_one_routes_modern_pdf():
    from pdf_parser_spark.jobs.extract import extract_one

    r = extract_one(_mk_objstm_pdf())
    assert r["kind"] == "pdf"
    assert r["raw_text"].strip() == "modern pdf works"
    assert r["error"] is None
