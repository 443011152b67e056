"""URL canonicalization / domain operators (operators/urls.py)."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.urls import (
    canonical_url,
    filter_blocked_domains,
    registered_domain,
    url_dedup_key,
    with_url_columns,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_spec(spark):
    got = _canon(spark, [
        "HTTP://WWW.Foo.COM:80/Bar/?utm_source=x&b=2&a=1#frag",
        "https://Site.CO.UK:443/p/",
        "https://site.com:8080/x",          # non-default port kept
        "site.com/x//",                      # schemeless passthrough
        "http://a.com/x?utm_source=1&fbclid=2&gclid=3&ref=h",
        "http://a.com/?z=1&y=2",
        "  http://a.com/x  ",
    ])
    assert got == [
        "http://www.foo.com/Bar?a=1&b=2",
        "https://site.co.uk/p",
        "https://site.com:8080/x",
        "site.com/x",
        "http://a.com/x",
        "http://a.com?y=2&z=1",
        "http://a.com/x",
    ]


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [("http://www.foo.co.uk/x",), ("http://cdn.a.b.example.com/",),
         ("http://localhost/x",), ("http://example.com",),
         ("https://sub.shop.com.au:8443/y",)],
        ["url"],
    )
    got = [
        r.d for r in df.select(
            registered_domain(canonical_url(F.col("url"))).alias("d")
        ).collect()
    ]
    assert got == ["foo.co.uk", "example.com", "localhost",
                   "example.com", "shop.com.au"]


def test_url_dedup_key_folds_variants(spark):
    df = spark.createDataFrame(
        [("HTTP://a.COM:80/x/?b=1&a=1#f",), ("http://A.com/x?a=1&b=1",)],
        ["url"],
    )
    keys = {r.k for r in df.select(url_dedup_key(F.col("url")).alias("k")).collect()}
    assert len(keys) == 1


def test_blocklist_list_and_table_branches_agree(spark):
    df = spark.createDataFrame(
        [(1, "http://www.BAD.com/a"), (2, "https://ok.org/b"),
         (3, "http://cdn.bad.com/c?utm_source=x"), (4, "http://fine.co.uk/d")],
        ["doc_id", "url"],
    )
    blocked = ["bad.com"]
    via_list = filter_blocked_domains(df, blocked)
    assert {r.doc_id for r in via_list.collect()} == {2, 4}
    btab = spark.createDataFrame([(d,) for d in blocked], ["domain"])
    via_table = filter_blocked_domains(df, btab)
    assert {r.doc_id for r in via_table.collect()} == {2, 4}
    # the anti-join side is broadcast (no shuffle of the kept rows)
    plan = via_table._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "leftanti" in plan.lower()


def test_with_url_columns_projection_is_narrow(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], ["doc_id", "url"])
    out = with_url_columns(df)
    assert out.columns == ["doc_id", "url", "canon_url", "domain"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only


def test_surt_key(spark):
    from pdf_parser_spark.operators.urls import surt_key

    df = spark.createDataFrame(
        [("HTTP://WWW.News.Example.CO.UK:80/A/B/?utm_source=x&b=2#f",),
         ("https://sub.site.com/",)],
        "url string",
    )
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    # canonicalization folds trailing slashes, so a root path is empty
    assert got == ["uk,co,example,news)/a/b?b=2", "com,site,sub)"]


def test_url_trap_stats_and_flagging(spark):
    from pdf_parser_spark.operators.urls import trap_patterns, url_trap_stats

    rows = (
        # calendar trap: 40 urls, 2 contents
        [(f"https://t.com/cal/{i}/{i % 5}?sid={i}", f"dup{i % 2}")
         for i in range(40)]
        # healthy article pattern: 10 urls, 10 contents
        + [(f"https://ok.com/article?id={i}", f"u{i}") for i in range(10)]
        # no-query path pattern
        + [("https://ok.com/about", "a")]
    )
    df = spark.createDataFrame(rows, "url string, fp string")
    stats = {
        (r.host, r.path_tpl, r.param_sig): r for r in url_trap_stats(df).collect()
    }
    trap = stats[("t.com", "/cal/N/N", "sid")]
    assert trap.n_urls == 40 and trap.n_contents == 2
    assert trap.trap_ratio == 20.0
    ok = stats[("ok.com", "/article", "id")]
    assert ok.n_urls == 10 and ok.n_contents == 10 and ok.trap_ratio == 1.0
    assert stats[("ok.com", "/about", "")].n_urls == 1

    flagged = trap_patterns(url_trap_stats(df), min_urls=20, min_ratio=5.0)
    assert [(r.host, r.path_tpl) for r in flagged.collect()] == [
        ("t.com", "/cal/N/N")
    ]


def test_url_trap_stats_duckdb_parity(spark):
    import duckdb

    from pdf_parser_spark.operators.urls import (
        url_trap_stats,
        url_trap_stats_sql,
    )

    rows = [
        (f"https://t.com/y/{i}?a={i}&b=1#frag", f"c{i % 3}") for i in range(9)
    ] + [("https://p.com/plain", "x"), ("no-scheme-url", "y")]
    df = spark.createDataFrame(rows, "url string, fp string")
    got = sorted(tuple(r) for r in url_trap_stats(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE pages(url VARCHAR, fp VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(url_trap_stats_sql("pages")).fetchall()
    )
    assert got == want and len(got) == 3
