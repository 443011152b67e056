"""RC4-encrypted PDFs (standard security handler, empty user
password) — the common crawled case of owner-restricted documents."""

import hashlib

from pdf_parser_spark.pdf.crypt import (
    PAD, _pad_password, object_key, rc4, standard_key,
)


def _mk_encrypted_pdf(r: int = 2, length_bits: int = 40) -> bytes:
    content = b"BT /F1 12 Tf 72 700 Td (secret but readable) Tj ET"
    id0 = b"0123456789abcdef"
    p = -44
    # Algorithm 3: /O from (empty) owner+user passwords
    okey = hashlib.md5(_pad_password(b"")).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    n = 5 if r == 2 else length_bits // 8
    o_entry = rc4(okey[:n], _pad_password(b""))
    if r >= 3:
        for i in range(1, 20):
            o_entry = rc4(bytes(b ^ i for b in okey[:n]), o_entry)
    fkey = standard_key(o_entry, p, id0, r, length_bits)
    if r == 2:  # Algorithm 4: /U
        u_entry = rc4(fkey, PAD)
    else:       # Algorithm 5
        u = hashlib.md5(PAD + id0).digest()
        u = rc4(fkey, u)
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in fkey), u)
        u_entry = u + b"\x00" * 16

    def enc_stream(num: int, data: bytes) -> bytes:
        return rc4(object_key(fkey, num, 0), data)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def put(num, raw):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + raw + b"\nendobj\n")

    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    put(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    cs = enc_stream(4, content)
    put(4, b"<< /Length " + str(len(cs)).encode() + b" >>\nstream\n"
           + cs + b"\nendstream")
    put(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    title = enc_stream(6, b"classified title")
    put(6, b"<< /Title " + hexs(title) + b" >>")
    put(7, b"<< /Filter /Standard /V " +
           (b"1" if r == 2 else b"2") + b" /R " + str(r).encode() +
           b" /Length " + str(length_bits).encode() +
           b" /O " + hexs(o_entry) + b" /U " + hexs(u_entry) +
           b" /P " + str(p).encode() + b" >>")
    xref_off = len(out)
    out.extend(b"xref\n0 8\n0000000000 65535 f \n")
    for i in range(1, 8):
        out.extend(f"{offsets[i]:010d} 00000 n \n".encode())
    out.extend(b"trailer\n<< /Size 8 /Root 1 0 R /Info 6 0 R "
               b"/Encrypt 7 0 R /ID [" + hexs(id0) + hexs(id0) +
               b"] >>\nstartxref\n" + str(xref_off).encode() +
               b"\n%%EOF\n")
    return bytes(out)


def test_rc4_40bit_r2():
    from pdf_parser_spark.pdf.metadata import extract_metadata
    from pdf_parser_spark.pdf.text import extract_document_text

    pdf = _mk_encrypted_pdf(r=2)
    assert extract_document_text(pdf) == "secret but readable\n"
    meta = extract_metadata(pdf)
    assert meta["Title"] == "classified title"


def test_rc4_128bit_r3():
    from pdf_parser_spark.pdf.text import extract_document_text

    pdf = _mk_encrypted_pdf(r=3, length_bits=128)
    assert extract_document_text(pdf) == "secret but readable\n"


def test_pipeline_contains_encrypted_error_free():
    from pdf_parser_spark.jobs.extract import extract_one

    r = extract_one(_mk_encrypted_pdf())
    assert r["kind"] == "pdf"
    assert r["raw_text"].strip() == "secret but readable"
    assert r["error"] is None
