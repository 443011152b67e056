"""sitemap.xml source (sitemaps.org protocol): URL discovery for the
crawl tier.

robots.txt (sources/robots.py) tells a crawler where it MAY NOT go;
sitemaps tell it where content IS — the other half of crawl
discovery. A host's sitemap is either a ``<urlset>`` (url entries
with loc / lastmod / changefreq / priority) or a ``<sitemapindex>``
(loc entries pointing at child sitemaps, which the fetch loop
retrieves and feeds back through this parser).

Parsing is fully NATIVE (split on the per-entry closing tag →
posexplode → regexp per field → entity unescape as a chained
replace): sitemap files are machine-generated against a fixed schema,
so field extraction by local-name regexp is exact in practice and
keeps the pass in codegen — important because a discovery sweep
parses one file per (host × sitemap) at crawl scale. Splitting on the
closing tag keeps each entry's fields ALIGNED (per-field xpath
arrays lose alignment when an optional field is missing from some
entries).

Composition: `sitemap_urls` rows are frontier candidates —
`jobs/frontier.py` dedups them, gates them through robots, and
assigns politeness waves; `lastmod` feeds `jobs/refresh.py`'s
changed-url priority. `sitemap_children` is the fetch plan for the
next discovery round (the driver loop fetches and re-parses).

Reference parity: none (the reference has no crawl tier); semantics
per the public sitemaps.org protocol spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

#: XML entity unescape order: specific entities first, &amp; LAST
#: (so a literal "&amp;lt;" round-trips to "&lt;", not "<").
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _unescape(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _unescape_sql(expr: str) -> str:
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    return expr


def _field(block: Column, tag: str) -> Column:
    return F.trim(F.regexp_extract(block, f"<{tag}>([^<]*)</{tag}>", 1))


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, kind, loc, lastmod, changefreq, priority): one row per
    entry of each sitemap body.

    `kind` is 'urlset' for page entries or 'index' for child-sitemap
    pointers (``<sitemapindex>`` checked first — an index never
    contains ``<urlset>`` but defensive order costs nothing).
    `lastmod`/`changefreq` stay strings ('' when absent — W3C
    datetime precision varies by site; `jobs/refresh.py` parses what
    it needs); `priority` is try_cast to double (NULL when absent or
    malformed). `loc` is entity-unescaped. Bodies that are neither
    kind yield no rows."""
    host = F.col(host_col).alias("host")
    xml = F.col(xml_col)

    def entries(kind: str, marker: str, closer: str) -> DataFrame:
        return (
            df.filter(xml.contains(marker))
            .select(
                host,
                F.lit(kind).alias("kind"),
                F.explode(F.split(xml, closer)).alias("blk"),
            )
            .filter(F.col("blk").contains("<loc>"))
            .select(
                "host",
                "kind",
                _unescape(_field(F.col("blk"), "loc")).alias("loc"),
                _field(F.col("blk"), "lastmod").alias("lastmod"),
                _field(F.col("blk"), "changefreq").alias("changefreq"),
                F.expr(
                    "try_cast(trim(regexp_extract(blk,"
                    " '<priority>([^<]*)</priority>', 1)) AS double)"
                ).alias("priority"),
            )
        )

    return entries("index", "<sitemapindex", "</sitemap>").unionAll(
        entries("urlset", "<urlset", "</url>")
    )


def parse_sitemaps_sql(
    src: str, host_col: str = "host", xml_col: str = "xml"
) -> str:
    """DuckDB twin of :func:`parse_sitemaps` (same split/regexp
    algorithm, independent engine)."""

    def branch(kind: str, marker: str, closer: str) -> str:
        return f"""
  SELECT {host_col} AS host, '{kind}' AS kind,
         unnest(string_split({xml_col}, '{closer}')) AS blk
  FROM {src} WHERE {xml_col} LIKE '%{marker}%'"""

    loc = _unescape_sql("trim(regexp_extract(blk, '<loc>([^<]*)</loc>', 1))")
    return f"""
WITH blocks AS ({branch('index', '<sitemapindex', '</sitemap>')}
  UNION ALL {branch('urlset', '<urlset', '</url>')})
SELECT host, kind,
       {loc} AS loc,
       trim(regexp_extract(blk, '<lastmod>([^<]*)</lastmod>', 1)) AS lastmod,
       trim(regexp_extract(blk, '<changefreq>([^<]*)</changefreq>', 1))
         AS changefreq,
       TRY_CAST(trim(regexp_extract(blk, '<priority>([^<]*)</priority>', 1))
         AS DOUBLE) AS priority
FROM blocks WHERE blk LIKE '%<loc>%'
"""


def sitemap_urls(parsed: DataFrame) -> DataFrame:
    """Frontier candidates from parsed urlset entries:
    (host, url, lastmod, changefreq, priority), '' locs dropped."""
    return (
        parsed.filter((F.col("kind") == "urlset") & (F.col("loc") != ""))
        .select(
            "host",
            F.col("loc").alias("url"),
            "lastmod",
            "changefreq",
            "priority",
        )
    )


def sitemap_children(parsed: DataFrame) -> DataFrame:
    """Next discovery round's fetch plan from index entries:
    (host, sitemap_url, lastmod)."""
    return (
        parsed.filter((F.col("kind") == "index") & (F.col("loc") != ""))
        .select("host", F.col("loc").alias("sitemap_url"), "lastmod")
    )
