"""robots.txt parsing + politeness gate (sources/robots.py): RFC 9309
group semantics, longest-match/allow-wins verdicts, and DuckDB twins
byte-identical."""

import duckdb

from pdf_parser_spark.sources.robots import (
    parse_robots,
    parse_robots_sql,
    robots_allowed,
    robots_allowed_sql,
)

ROBOTS = [
    (
        "a.example.com",
        "# politeness file\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "\n"
        "User-agent: FancyBot\n"
        "User-agent: otherbot\n"       # consecutive UA lines: one group
        "Disallow: /\n",
    ),
    (
        "b.example.com",
        "Disallow: /ignored-no-group\n"   # rule before any UA: invalid
        "User-agent: *\n"
        "Disallow:\n"                     # empty = allow-all no-op
        "Crawl-delay: 10\n"               # extension directive: skipped
        "Disallow: /tmp  # trailing comment\n",
    ),
    ("c.example.com", ""),                # no rules at all
]

PAGES = [
    ("https://a.example.com/private/ok/page", "*", True),
    ("https://a.example.com/private/secret", "*", False),
    ("https://a.example.com/public", "*", True),
    ("https://a.example.com/anything", "fancybot", False),  # specific group
    ("https://A.EXAMPLE.COM/private/x", "*", False),        # host lowercased
    ("https://b.example.com/tmp/x", "*", False),
    ("https://b.example.com/ok", "*", True),
    ("https://c.example.com/", "*", True),                  # no rules: allow
    ("https://unknown.example.com/x", "*", True),           # unknown host
]


def _robots_df(spark):
    return spark.createDataFrame(ROBOTS, "host string, robots_txt string")


def test_parse_groups_and_noise(spark):
    rows = parse_robots(_robots_df(spark)).collect()
    got = {(r.host, r.agent, r.rule, r.path) for r in rows}
    assert got == {
        ("a.example.com", "*", "disallow", "/private"),
        ("a.example.com", "*", "allow", "/private/ok"),
        ("a.example.com", "fancybot", "disallow", "/"),
        ("a.example.com", "otherbot", "disallow", "/"),
        ("b.example.com", "*", "disallow", "/tmp"),
    }
    # consecutive UA lines share one group id
    by_agent = {r.agent: r.group_id for r in rows if r.host == "a.example.com"}
    assert by_agent["fancybot"] == by_agent["otherbot"] != by_agent["*"]


def test_gate_verdicts(spark):
    rules = parse_robots(_robots_df(spark))
    for agent in ("*", "fancybot"):
        pages = spark.createDataFrame(
            [(u,) for u, a, _ in PAGES if a == agent], "url string"
        )
        out = {r.url: r.allowed
               for r in robots_allowed(pages, rules, agent=agent).collect()}
        for url, a, expect in PAGES:
            if a == agent:
                assert out[url] is expect, (url, agent)


def test_longest_match_allow_wins(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("h", "User-agent: *\nAllow: /p\nDisallow: /p\nDisallow: /p/q")],
            "host string, robots_txt string",
        )
    )
    pages = spark.createDataFrame(
        [("http://h/p/x",), ("http://h/p/q/x",)], "url string"
    )
    out = {r.url: (r.allowed, r.matched_path)
           for r in robots_allowed(pages, rules).collect()}
    assert out["http://h/p/x"] == (True, "/p")       # tie: allow wins
    assert out["http://h/p/q/x"] == (False, "/p/q")  # longest wins


def _duck_fixture(con):
    con.execute("CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots VALUES (?, ?)", ROBOTS)
    con.execute("CREATE TABLE pages (url VARCHAR)")
    con.executemany(
        "INSERT INTO pages VALUES (?)",
        [(u,) for u, a, _ in PAGES if a == "*"],
    )


def test_duckdb_twins_byte_identical(spark):
    con = duckdb.connect()
    _duck_fixture(con)
    rules_df = parse_robots(_robots_df(spark))
    got = sorted(tuple(r) for r in rules_df.collect())
    want = sorted(
        tuple(r) for r in con.execute(parse_robots_sql("robots")).fetchall()
    )
    assert got == want

    pages = spark.createDataFrame(
        [(u,) for u, a, _ in PAGES if a == "*"], "url string"
    )
    got = sorted(
        tuple(r) for r in robots_allowed(pages, rules_df).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            robots_allowed_sql("pages", parse_robots_sql("robots"))
        ).fetchall()
    )
    # NULLs sort differently across engines; compare as sets of tuples
    assert set(got) == set(want) and len(got) == len(want)


def test_robots_sitemaps_group_independent(spark):
    from pdf_parser_spark.sources.robots import robots_sitemaps

    df = spark.createDataFrame(
        [("a.com", "User-agent: x\nSitemap: https://a.com/sm.xml\n"
                   "sitemap: https://a.com/sm.xml # dup+case\n"),
         ("b.com", "Sitemap: https://b.com/s1.xml\nDisallow: /\n"),
         ("c.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    got = sorted(tuple(r) for r in robots_sitemaps(df).collect())
    assert got == [("a.com", "https://a.com/sm.xml"),
                   ("b.com", "https://b.com/s1.xml")]


def test_crawl_delays_shadowing_and_validation(spark):
    from pdf_parser_spark.sources.robots import crawl_delays

    df = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 10\n\n"
                   "User-agent: fancybot\nCrawl-delay: 2\n"),
         ("b.com", "User-agent: *\nCrawl-delay: abc\n"),   # non-numeric
         ("c.com", "User-agent: other\nCrawl-delay: 7\n"),  # no group
         ("d.com", "User-agent: *\nCrawl-delay: 1\n"
                   "User-agent: *\nCrawl-delay: 4\n")],     # max wins
        "host string, robots_txt string",
    )
    star = {r.host: r.delay_secs for r in crawl_delays(df).collect()}
    fb = {r.host: r.delay_secs
          for r in crawl_delays(df, agent="fancybot").collect()}
    assert star == {"a.com": 10.0, "d.com": 4.0}
    # the specific agent's group shadows '*' entirely
    assert fb["a.com"] == 2.0 and fb["d.com"] == 4.0
    assert "b.com" not in star and "c.com" not in star


def test_crawl_delays_rule_lines_terminate_groups(spark):
    """Round-4 advisor repro: an allow/disallow line between two
    user-agent blocks TERMINATES the first group (RFC 9309 §2.2.1),
    so the specific agent must NOT inherit the following '*' group's
    Crawl-delay — and the DuckDB twin must agree."""
    import duckdb

    from pdf_parser_spark.sources.robots import (
        crawl_delays,
        crawl_delays_sql,
    )

    rows = [
        ("e.com", "User-agent: googlebot\nDisallow: /a\n\n"
                  "User-agent: *\nCrawl-delay: 5\n"),
        # delay inside the SAME group, after a rule line: still applies
        ("f.com", "User-agent: googlebot\nDisallow: /a\n"
                  "Crawl-delay: 3\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {r.host: r.delay_secs
           for r in crawl_delays(df, agent="googlebot").collect()}
    # googlebot's own group carries no delay on e.com and is shadowed
    # from '*', so no row; f.com's in-group delay survives
    assert got == {"f.com": 3.0}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)"
    )
    con.executemany("INSERT INTO robots VALUES (?, ?)", rows)
    want = dict(con.execute(
        crawl_delays_sql("robots", agent="googlebot")
    ).fetchall())
    assert want == got
