"""CDX(J) index source (sources/cdx.py): native line parse, fetch
planning, latest-capture dedup."""

from pdf_parser_spark.sources.cdx import fetch_plan, latest_capture, parse_cdx

LINES = [
    # surt ts json
    'com,a)/x 20240101000000 {"url": "https://a.com/x", "mime": '
    '"text/html", "status": "200", "digest": "sha1:1", "length": "100", '
    '"offset": "0", "filename": "seg-0.warc.gz"}',
    # newer capture of the same surt
    'com,a)/x 20240101000100 {"url": "https://a.com/x", "mime": '
    '"text/html", "status": "200", "digest": "sha1:2", "length": "120", '
    '"offset": "500", "filename": "seg-1.warc.gz"}',
    # 404 capture — excluded from plan/latest
    'com,a)/y 20240101000000 {"url": "https://a.com/y", "mime": '
    '"text/html", "status": "404", "digest": "sha1:3", "length": "50", '
    '"offset": "900", "filename": "seg-0.warc.gz"}',
    # malformed JSON — contained, nulls in JSON-derived columns
    "com,a)/z 20240101000000 {not json",
]


def _captures(spark):
    return parse_cdx(
        spark.createDataFrame([(l,) for l in LINES], "line string")
    )


def test_parse_cdx_fields_and_containment(spark):
    rows = {(r.surt, r.fetch_unix): r for r in _captures(spark).collect()}
    r = rows[("com,a)/x", 1704067200)]
    assert (r.url, r.mime, r.status, r.length, r.offset, r.filename) == (
        "https://a.com/x", "text/html", 200, 100, 0, "seg-0.warc.gz"
    )
    assert ("com,a)/x", 1704067260) in rows  # +60 s capture
    bad = rows[("com,a)/z", 1704067200)]
    assert bad.url is None and bad.status is None  # contained, not raised


def test_fetch_plan_groups_by_file(spark):
    plan = {r.filename: r for r in fetch_plan(_captures(spark)).collect()}
    assert set(plan) == {"seg-0.warc.gz", "seg-1.warc.gz"}  # 404 dropped
    s0 = plan["seg-0.warc.gz"]
    assert (s0.n_records, s0.min_offset, s0.end_offset, s0.total_bytes) == (
        1, 0, 100, 100
    )


def test_latest_capture_picks_newest(spark):
    rows = latest_capture(_captures(spark)).collect()
    assert [(r.surt, r.fetch_unix, r.filename) for r in rows] == [
        ("com,a)/x", 1704067260, "seg-1.warc.gz")
    ]


def test_fetch_unix_tz_independent(spark):
    """CDX timestamps are UTC by spec; fetch_unix must NOT depend on
    spark.sql.session.timeZone (the arithmetic parse in parse_cdx —
    a to_timestamp-based parse would shift every epoch by the session
    offset, here -5h/-4h for America/New_York)."""
    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        rows = {(r.surt, r.fetch_unix) for r in _captures(spark).collect()}
    finally:
        spark.conf.set(tz_key, orig)
    assert ("com,a)/x", 1704067200) in rows
    assert ("com,a)/x", 1704067260) in rows


def test_malformed_timestamp_contained(spark):
    bad = 'com,a)/w 2024010100 {"url": "https://a.com/w"}'  # 10 digits
    rows = parse_cdx(
        spark.createDataFrame([(bad,)], "line string")
    ).collect()
    assert rows[0].fetch_unix is None  # contained, not raised/garbage
