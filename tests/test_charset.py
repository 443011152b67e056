# -*- coding: utf-8 -*-
"""Charset sniffing + decoding (functions/charset.py): precedence,
label normalization, and decode parity against Python's own codecs
(the cross-engine parity runs in the `charset_sniff` / `html_decode`
oracle rows)."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.functions import charset as cs
from pdf_parser_spark.functions.mojibake import _CP1252_GRAPHICS


def _decode_pages(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "id long, html binary",
    )
    rows = cs.decode_pages(df, "html", "id").orderBy("id").collect()
    return [(r["charset"], r["bom"], r["meta_label"], r["text"]) for r in rows]


def _sloppy_cp1252(bs: bytes) -> str:
    return "".join(_CP1252_GRAPHICS.get(b, chr(b)) for b in bs)


def test_precedence_and_decode(spark):
    payloads = [
        b"plain ascii, no signals",
        b"\xef\xbb\xbfcaf\xc3\xa9",                   # BOM utf-8
        b'<meta charset="windows-1252">\x93q\x94',    # meta cp1252
        b"<META Charset=ISO-8859-1>caf\xe9",          # latin1 label folds
        b"valid utf-8 caf\xc3\xa9 no meta",           # validity fallback
        b"invalid \xe9 no meta",                      # cp1252 fallback
        b"<meta charset=utf-8>bad \xe9",              # unverifiable meta
    ]
    out = _decode_pages(spark, payloads)
    assert out[0] == ("utf-8", None, "", "plain ascii, no signals")
    assert out[1] == ("utf-8", "utf-8", "", "caf\xe9")
    assert out[2] == (
        "windows-1252", None, "windows-1252",
        '<meta charset="windows-1252">“q”',
    )
    assert out[3] == (
        "windows-1252", None, "iso-8859-1", "<META Charset=ISO-8859-1>caf\xe9"
    )
    assert out[4] == ("utf-8", None, "", "valid utf-8 caf\xe9 no meta")
    assert out[5] == ("windows-1252", None, "", "invalid \xe9 no meta")
    # meta says utf-8 but the stream does not validate → cp1252 path
    assert out[6] == (
        "windows-1252", None, "utf-8", "<meta charset=utf-8>bad \xe9"
    )


def test_bom_beats_meta(spark):
    out = _decode_pages(spark, [b'\xef\xbb\xbf<meta charset="latin1">x'])
    assert out[0][0] == "utf-8" and out[0][1] == "utf-8"
    # the meta label is still REPORTED (telemetry), just not obeyed
    assert out[0][2] == "latin1"


def test_utf16_ascii_subset_and_null_beyond(spark):
    le = b"\xff\xfe" + "hello 16".encode("utf-16le")
    be = b"\xfe\xff" + "hello 16".encode("utf-16be")
    wide = b"\xff\xfe" + "caf\xe9".encode("utf-16le")
    out = _decode_pages(spark, [le, be, wide])
    assert out[0] == ("utf-16le", "utf-16le", "", "hello 16")
    assert out[1] == ("utf-16be", "utf-16be", "", "hello 16")
    assert out[2][0] == "utf-16le" and out[2][3] is None


def test_cp1252_full_repertoire_vs_python(spark):
    """decode_cp1252 must agree with the Python sloppy-cp1252
    reference on every byte 0x01-0xFF (NUL excluded: no charset
    carries it in text)."""
    payload = bytes(range(1, 256))
    df = spark.createDataFrame([(bytearray(payload),)], "html binary")
    got = df.select(
        cs.decode_cp1252(F.hex(F.col("html"))).alias("t")
    ).head()["t"]
    assert got == _sloppy_cp1252(payload)


def test_meta_prescan_window_is_1024_bytes(spark):
    late = b" " * 1024 + b'<meta charset="windows-1252">ok'
    out = _decode_pages(spark, [late])
    assert out[0][2] == ""          # meta outside the prescan window
    assert out[0][0] == "utf-8"     # pure-ASCII stream validates


def test_label_map_covers_whatwg_utf16_quirk(spark):
    # meta utf-16 → utf-8 per the WHATWG prescan rule
    out = _decode_pages(spark, [b"<meta charset=utf-16>ascii body"])
    assert out[0][0] == "utf-8" and out[0][2] == "utf-16"


@pytest.mark.parametrize(
    "label,want",
    [("utf8", "utf-8"), ("latin1", "windows-1252"), ("l1", "windows-1252"),
     ("us-ascii", "windows-1252"), ("cp1252", "windows-1252"),
     ("ansi_x3.4-1968", "windows-1252"), ("utf-16be", "utf-8")],
)
def test_label_normalization(spark, label, want):
    payload = f"<meta charset={label}>body".encode()
    out = _decode_pages(spark, [payload])
    assert out[0][0] == want and out[0][2] == label


def test_utf8_validator_rejects_overlongs_and_surrogates(spark):
    cases = {
        b"\xc0\xaf": False,           # overlong 2-byte
        b"\xe0\x80\xaf": False,       # overlong 3-byte
        b"\xed\xa0\x80": False,       # surrogate
        b"\xf4\x90\x80\x80": False,   # > U+10FFFF
        b"\xf4\x8f\xbf\xbf": True,    # U+10FFFF exactly
        b"\xf0\x90\x80\x80": True,    # U+10000
        "é€𝄞".encode("utf-8"): True,
    }
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(cases)],
        "id long, html binary",
    )
    got = (
        df.select(
            "id",
            F.hex("html").rlike(cs.UTF8_VALID_HEX_RE).alias("ok"),
        )
        .orderBy("id")
        .collect()
    )
    assert [r["ok"] for r in got] == list(cases.values())


def test_worker_mirror_agrees_with_column_path(spark):
    """sniff_bytes/decode_bytes (the extraction worker's full-fidelity
    mirror) must agree with the column path on every input where both
    are defined; where they diverge by design (non-ASCII utf-16,
    BOM'd-but-invalid utf-8) the column path is NULL and the mirror
    still decodes."""
    payloads = [
        b"plain ascii",
        b"\xef\xbb\xbfcaf\xc3\xa9",
        b'<meta charset="windows-1252">\x93q\x94',
        b"<META Charset=ISO-8859-1>caf\xe9",
        b"valid caf\xc3\xa9",
        b"invalid \xe9",
        b"<meta charset=utf-8>bad \xe9",
        b"\xff\xfe" + "hi".encode("utf-16le"),
        b"\xfe\xff" + "hi".encode("utf-16be"),
        b"\xff\xfe" + "caf\xe9".encode("utf-16le"),   # non-ascii utf-16
        b"\xef\xbb\xbfbad \xe9",                      # BOM'd, invalid
    ]
    col = _decode_pages(spark, payloads)
    for p, (charset, _bom, _meta, text) in zip(payloads, col):
        assert cs.sniff_bytes(p) == charset, p
        full = cs.decode_bytes(p)
        if text is not None:
            assert full == text, p
        else:
            assert isinstance(full, str) and full != "", p


def test_extraction_html_route_is_charset_aware(spark):
    from pdf_parser_spark.jobs.extract import extract_documents

    prose = b"plenty of ordinary body prose keeps the block classifier happy. " * 3
    pages = spark.createDataFrame(
        [("u1", bytearray(
            b"<html><meta charset=latin1><body><main><p>"
            b"caf\xe9 costs \x8020 \x93really\x94 " + prose + b"</p>"
            b"</main></body></html>")),
         ("u2", bytearray(
            b"\xff\xfe" + ("<html><body><main><p>wide page text here "
            + prose.decode() + "</p></main></body></html>"
            ).encode("utf-16le")))],
        "url string, html binary",
    )
    rows = {r.url: r for r in extract_documents(pages).collect()}
    # the reference's T2 clean strips non-ASCII (pinned quirk), so the
    # cp1252 chars land in raw_text and leave clean ASCII behind; the
    # sniffed charset is recorded as telemetry
    assert rows["u1"].text.startswith("caf costs 20 really plenty")
    assert rows["u1"].metadata["charset"] == "windows-1252"
    # a blind utf-8 decode of utf-16le bytes yields NUL-riddled
    # pseudo-markup and NO extractable text — this line existing at
    # all proves the charset-aware path ran
    assert "wide page text here" in rows["u2"].text
    assert rows["u2"].metadata["charset"] == "utf-16le"


def test_cp1252_sql_transcode_full_repertoire():
    """The DuckDB hex-transcode chain (5 range passes + 32 literal
    replaces, pass order load-bearing) must reproduce the Python
    sloppy-cp1252 decode for EVERY byte 0x01-0xFF."""
    import duckdb

    payload = bytes(range(1, 256))
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + cs.decode_cp1252_sql(f"'{payload.hex().upper()}'")
    ).fetchone()[0]
    assert got == _sloppy_cp1252(payload)
