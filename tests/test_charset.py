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
