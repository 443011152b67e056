"""sitemap.xml source (sources/sitemaps.py): urlset/index parsing,
field alignment with optional fields, entity unescape, whitespace
trim, invalid bodies, and DuckDB twin parity. Semantics per the
public sitemaps.org protocol; the reference app has no crawl tier.
"""

from __future__ import annotations

import duckdb

from pdf_parser_spark.sources.sitemaps import (
    parse_sitemaps,
    parse_sitemaps_sql,
    sitemap_children,
    sitemap_urls,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.com/page?x=1&amp;y=2</loc>
    <lastmod>2024-03-01T10:00:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://a.com/plain </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://a.com/apos&apos;d</loc><priority>bogus</priority></url>
</urlset>"""

_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://b.com/maps/s1.xml</loc>
    <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://b.com/maps/s2.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark):
    return spark.createDataFrame(
        [("a.com", _URLSET), ("b.com", _INDEX), ("c.com", "junk body")],
        "host string, xml string",
    )


def test_urlset_fields_aligned(spark):
    rows = sorted(
        (
            (r.loc, r.lastmod, r.changefreq, r.priority)
            for r in parse_sitemaps(_df(spark))
            .filter("kind = 'urlset'")
            .collect()
        )
    )
    # the no-loc entry is dropped; optional fields stay aligned with
    # THEIR entry (the per-field-xpath failure mode this parser avoids)
    assert rows == [
        ("https://a.com/apos'd", "", "", None),  # bogus priority -> NULL
        ("https://a.com/page?x=1&y=2", "2024-03-01T10:00:00Z", "daily", 0.8),
        ("https://a.com/plain", "", "", None),
    ]


def test_index_and_invalid(spark):
    parsed = parse_sitemaps(_df(spark))
    kids = sorted(
        (r.host, r.sitemap_url, r.lastmod)
        for r in sitemap_children(parsed).collect()
    )
    assert kids == [
        ("b.com", "https://b.com/maps/s1.xml", "2024-02-01"),
        ("b.com", "https://b.com/maps/s2.xml", ""),
    ]
    assert not [r for r in parsed.collect() if r.host == "c.com"]
    urls = sitemap_urls(parsed).collect()
    assert {r.host for r in urls} == {"a.com"} and len(urls) == 3


def test_double_escaped_entity_roundtrip(spark):
    xml = "<urlset><url><loc>https://a.com/?q=x&amp;amp;y</loc></url></urlset>"
    df = spark.createDataFrame([("a.com", xml)], "host string, xml string")
    (r,) = parse_sitemaps(df).collect()
    # &amp;amp; unescapes to &amp; — specific entities first, &amp;
    # last, so the literal stays literal
    assert r.loc == "https://a.com/?q=x&amp;y"


def test_duckdb_twin_parity(spark):
    rows = [("a.com", _URLSET), ("b.com", _INDEX), ("c.com", "junk")]
    got = sorted(
        tuple(r) for r in parse_sitemaps(
            spark.createDataFrame(rows, "host string, xml string")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE sm(host VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO sm VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        parse_sitemaps_sql("sm")
    ).fetchall())
    assert got == want and len(got) == 5
