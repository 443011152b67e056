"""WARC source (sources/warc.py): parser spec, gzip members,
containment, and the pages→extraction integration."""

import gzip

from pdf_parser_spark.sources.warc import (
    build_warc,
    build_wet,
    gunzip_members,
    parse_warc_bytes,
    warc_pages,
    warc_records,
    wet_text,
)

RECS = [
    # ≥10 words so the (frozen) boilerplate classifier keeps the block
    ("http://a.test/1",
     b"<html><body><p>Hello parser this paragraph carries enough words"
     b" to pass the frozen content classifier</p></body></html>",
     "text/html"),
    ("http://a.test/2", b"plain body", "text/plain"),
    ("http://a.test/3", b"", "text/html"),  # empty body
]


def test_parse_roundtrip_fields():
    got = list(parse_warc_bytes(build_warc(RECS), src="seg"))
    assert [r["error"] for r in got] == [None] * 3
    assert [r["url"] for r in got] == [u for u, _, _ in RECS]
    assert [r["payload"] for r in got] == [b for _, b, _ in RECS]
    assert all(r["warc_type"] == "response" for r in got)
    assert all(r["http_status"] == 200 for r in got)
    assert got[1]["rec_offset"] > got[0]["rec_offset"]


def test_gzip_whole_and_per_member():
    raw = build_warc(RECS)
    whole = gzip.compress(raw)
    # Common Crawl layout: one gzip member per record
    members = b"".join(gzip.compress(build_warc([r])) for r in RECS)
    assert gunzip_members(whole) == raw
    assert gunzip_members(members) == raw
    for blob in (whole, members):
        got = list(parse_warc_bytes(blob))
        assert [r["url"] for r in got] == [u for u, _, _ in RECS]


def test_malformed_contained_prior_records_survive():
    blob = build_warc(RECS[:2]) + b"GARBAGE NOT A RECORD"
    got = list(parse_warc_bytes(blob, src="seg"))
    assert [r["error"] for r in got[:2]] == [None, None]
    assert got[2]["error"].startswith("framing")
    assert got[2]["rec_offset"] > 0
    # truncated payload
    trunc = build_warc(RECS[:1])[:-10]
    got = list(parse_warc_bytes(trunc))
    assert got[0]["error"] == "framing: truncated payload"
    # bad gzip
    got = list(parse_warc_bytes(b"\x1f\x8bnot gzip at all"))
    assert got[0]["error"].startswith("gzip")


def test_warc_records_and_pages_to_extraction(spark):
    blob = build_warc(RECS)
    blobs = spark.createDataFrame(
        [("seg-0.warc", bytearray(blob))], "path string, content binary"
    )
    recs = warc_records(blobs).collect()
    assert len(recs) == 3 and all(r.error is None for r in recs)

    pages = warc_pages(blobs)
    rows = {r.url: bytes(r.html) for r in pages.collect()}
    assert rows["http://a.test/1"] == RECS[0][1]

    from pdf_parser_spark.jobs.extract import extract_documents

    docs = {r.url: r for r in extract_documents(pages).collect()}
    assert "Hello parser" in docs["http://a.test/1"].text
    assert docs["http://a.test/1"].error is None


def test_wet_conversion_records(spark):
    wet = build_wet([("http://a.test/1", "pre-extracted text ünïcode"),
                     ("http://a.test/2", "")])
    # per-member gzip, as Common Crawl ships WET
    blob = b"".join(
        gzip.compress(build_wet([r]))
        for r in [("http://a.test/1", "pre-extracted text ünïcode"),
                  ("http://a.test/2", "")]
    )
    for payload in (wet, blob):
        blobs = spark.createDataFrame(
            [("seg.wet", bytearray(payload))], "path string, content binary"
        )
        rows = {r.url: r.text for r in wet_text(blobs).collect()}
        assert rows == {"http://a.test/1": "pre-extracted text ünïcode",
                        "http://a.test/2": ""}
        # conversion records are NOT pages (no HTTP envelope / response)
        assert warc_pages(blobs).count() == 0
