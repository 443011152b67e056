"""WARC container source — the format web-scale corpora actually ship
in (Common Crawl publishes WARC/1.0 with per-record gzip members;
spec: ISO 28500 / the public IIPC warc-specifications).

The reference app ingests one uploaded file per request
(`src/pdf_parser.py` route-level handling); at 10^12 rows the unit of
ingest is a WARC segment, so this module turns a DataFrame of WARC
blobs (e.g. ``spark.read.format("binaryFile")``) into a records table
and a ``(url, html)`` pages table that feeds
:func:`~pdf_parser_spark.jobs.extract.extract_documents` unchanged.

Design for 100 TB:
- one WARC file = one task (``binaryFile`` keeps whole files;
  ``spark.sql.files.maxPartitionBytes`` is irrelevant to the split —
  WARC members are not splittable mid-stream when record-gzipped).
  Parallelism = file count, which at crawl scale is millions.
- parsing is an Arrow-batched ``mapInPandas`` generator that yields
  per-RECORD batches, so a 1 GB segment never materializes twice and
  payloads never shuffle — the same fused-stage discipline as the
  extraction job.
- malformed records are CONTAINED row-level: a parse error emits one
  error row for the remainder of that file (offset + message) and
  the file's earlier records survive — no task failure, matching the
  extraction job's error-column contract.

Gzip: a leading ``1f 8b`` magic triggers member-by-member
decompression (``zlib`` with the unused-data loop), which handles
both whole-file gzip and Common Crawl's record-per-member layout.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

RECORDS_SCHEMA = StructType([
    StructField("src", StringType()),
    StructField("rec_offset", LongType()),
    StructField("warc_type", StringType()),
    StructField("url", StringType()),
    StructField("content_type", StringType()),
    StructField("http_status", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("error", StringType()),
])


def gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl's layout)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def _parse_http(payload: bytes):
    """Split an ``application/http`` payload into (status, body)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep or not head.startswith(b"HTTP/"):
        return None, payload
    line = head.split(b"\r\n", 1)[0].split()
    try:
        return int(line[1]), body
    except (IndexError, ValueError):
        return None, body


def parse_warc_bytes(data: bytes, src: str = "") -> Iterator[dict]:
    """Pure-Python WARC/1.x record iterator over one segment's bytes.

    Yields dicts matching :data:`RECORDS_SCHEMA`. On a framing error,
    yields ONE error row carrying the byte offset and stops — prior
    records are already out (containment, not all-or-nothing).
    """
    if data[:2] == b"\x1f\x8b":
        try:
            data = gunzip_members(data)
        except zlib.error as e:
            yield {"src": src, "rec_offset": 0, "warc_type": None,
                   "url": None, "content_type": None, "http_status": None,
                   "payload": None, "error": f"gzip: {e}"}
            return
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        start = pos
        if not data.startswith(b"WARC/", pos):
            yield {"src": src, "rec_offset": start, "warc_type": None,
                   "url": None, "content_type": None, "http_status": None,
                   "payload": None,
                   "error": "framing: expected WARC/ version line"}
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield {"src": src, "rec_offset": start, "warc_type": None,
                   "url": None, "content_type": None, "http_status": None,
                   "payload": None, "error": "framing: unterminated header"}
            return
        headers = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            yield {"src": src, "rec_offset": start, "warc_type": None,
                   "url": None, "content_type": None, "http_status": None,
                   "payload": None, "error": "framing: bad Content-Length"}
            return
        body_start = hdr_end + 4
        if body_start + clen > n:
            yield {"src": src, "rec_offset": start, "warc_type": None,
                   "url": None, "content_type": None, "http_status": None,
                   "payload": None, "error": "framing: truncated payload"}
            return
        payload = data[body_start:body_start + clen]
        ctype = headers.get(b"content-type", b"").decode("latin-1") or None
        status: Optional[int] = None
        if ctype and ctype.startswith("application/http"):
            status, payload = _parse_http(payload)
        yield {
            "src": src,
            "rec_offset": start,
            "warc_type":
                headers.get(b"warc-type", b"").decode("latin-1") or None,
            "url":
                headers.get(b"warc-target-uri", b"").decode("latin-1") or None,
            "content_type": ctype,
            "http_status": status,
            "payload": payload,
            "error": None,
        }
        pos = body_start + clen


def warc_records(
    blobs: DataFrame, bytes_col: str = "content", path_col: str = "path",
) -> DataFrame:
    """WARC segments → records table (one row per WARC record).

    `blobs` is any DataFrame with a path column and a binary column —
    ``spark.read.format("binaryFile").load(dir)`` in production.
    """
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for src, data in zip(pdf[path_col], pdf[bytes_col]):
                recs = list(parse_warc_bytes(bytes(data), src=str(src)))
                if recs:
                    yield pd.DataFrame(recs)

    return blobs.select(path_col, bytes_col).mapInPandas(
        gen, schema=RECORDS_SCHEMA
    )


def warc_pages(
    blobs: DataFrame, bytes_col: str = "content", path_col: str = "path",
) -> DataFrame:
    """WARC segments → the ``(url, html)`` pages table the extraction
    job consumes: 2xx response records only, payload = HTTP body."""
    from pyspark.sql import functions as F

    recs = warc_records(blobs, bytes_col, path_col)
    return recs.where(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(200, 299)
        & F.col("url").isNotNull()
    ).select(F.col("url"), F.col("payload").alias("html"))


def wet_text(
    blobs: DataFrame, bytes_col: str = "content", path_col: str = "path",
) -> DataFrame:
    """WET segments → ``(url, text)``. WET is Common Crawl's
    pre-extracted-text sibling of WARC: same WARC/1.0 framing, but
    records are ``WARC-Type: conversion`` with a bare ``text/plain``
    payload (no HTTP envelope). Pipelines that trust CC's own
    extraction start here and skip the HTML parse entirely."""
    from pyspark.sql import functions as F

    recs = warc_records(blobs, bytes_col, path_col)
    return recs.where(
        (F.col("warc_type") == "conversion") & F.col("url").isNotNull()
    ).select(
        F.col("url"),
        F.decode(F.col("payload"), "utf-8").alias("text"),
    )


def build_wet(records: list) -> bytes:
    """Serialize (url, text) pairs into one WET segment (conversion
    records, text/plain payloads). Deterministic fixture writer."""
    out = []
    for url, text in records:
        body = text.encode("utf-8")
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + url.encode("latin-1") + b"\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        )
        out.append(hdr + body + b"\r\n\r\n")
    return b"".join(out)


def build_warc(records: list) -> bytes:
    """Serialize (url, body, content_type) triples into one WARC/1.0
    segment (response records with an HTTP/1.1 200 envelope) — the
    test/fixture writer; also the round-trip partner for the oracle
    query. Deterministic: no timestamps, no uuids."""
    out = []
    for url, body, ctype in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode("latin-1")
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode("latin-1") + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        out.append(hdr + http + b"\r\n\r\n")
    return b"".join(out)
