"""Link graph tier: parser spec (html/links.py), Spark operators
(operators/graph.py), PageRank vs an independent numpy fixpoint."""

import numpy as np
import pytest

from pdf_parser_spark.html.links import parse_page_links, resolve_href
from pdf_parser_spark.operators.graph import (
    anchor_topk,
    extract_links,
    link_edges,
    page_metadata,
    pagerank,
)

PAGE = """
<html><head><title> My   Page </title>
<meta name="robots" content="NOINDEX, nofollow">
<meta name="description" content="a test page">
<link rel="canonical" href="/canon">
<base href="/dir/">
</head><body>
<p><a href="https://other.test/x" rel="NOFOLLOW sponsored">Ext  link</a></p>
<a href="sub/page">rel link</a>
<a href="/root">root</a>
<a href="#frag">frag only</a>
<a href="javascript:void(0)">js</a>
<a href="mailto:a@b.c">mail</a>
<a href="">empty</a>
<a href="//proto.test/p">proto-rel</a>
<a href="nested1"><b>bold <a href="nested2">inner</a></b></a>
</body></html>
"""


def test_parse_page_links_fields():
    p = parse_page_links(PAGE)
    assert p.title == "My Page"
    assert p.description == "a test page"
    assert p.canonical == "/canon"
    assert p.robots_noindex and p.robots_nofollow
    assert p.base == "/dir/"
    hrefs = [lk.href for lk in p.links]
    # empty href dropped at parse; nested <a> splits like browsers
    assert "nested1" in hrefs and "nested2" in hrefs
    assert "" not in hrefs
    by_href = {lk.href: lk for lk in p.links}
    assert by_href["https://other.test/x"].nofollow
    assert by_href["https://other.test/x"].anchor == "Ext link"
    assert not by_href["sub/page"].nofollow


def test_parse_malformed_salvages():
    p = parse_page_links('<a href="/ok">text</a><b <<<broken')
    assert [lk.href for lk in p.links] == ["/ok"]


def test_resolve_href_spec():
    u = "https://site.test/dir/page"
    assert resolve_href(u, "https://abs.test/x") == "https://abs.test/x"
    assert resolve_href(u, "/root") == "https://site.test/root"
    assert resolve_href(u, "sub/x") == "https://site.test/dir/sub/x"
    assert resolve_href(u, "//proto.test/p") == "https://proto.test/p"
    # <base href> wins, itself resolved against the page URL
    assert resolve_href(u, "sub/x", "/b/") == "https://site.test/b/sub/x"
    for bad in ("", "  ", "#frag", "javascript:void(0)", "MAILTO:a@b",
                "tel:123", "data:text/plain,x", "about:blank"):
        assert resolve_href(u, bad) is None


def test_extract_links_and_metadata(spark):
    pages = spark.createDataFrame(
        [("https://site.test/dir/page", bytearray(PAGE.encode()))],
        "url string, html binary",
    )
    links = {r.dst: r for r in extract_links(pages).collect()}
    assert set(links) == {
        "https://other.test/x",
        "https://site.test/dir/sub/page",
        "https://site.test/root",
        "https://proto.test/p",
        "https://site.test/dir/nested1",
        "https://site.test/dir/nested2",
    }
    assert links["https://other.test/x"].nofollow

    (m,) = page_metadata(pages).collect()
    assert m.title == "My Page"
    assert m.canonical == "https://site.test/canon"
    assert m.robots_noindex and m.robots_nofollow
    assert m.n_links == 6


def test_link_edges_canonical_dedup(spark):
    links = spark.createDataFrame(
        [
            ("http://a.test/p/", "http://B.test:80/x?utm_source=z", False),
            ("http://a.test/p", "http://b.test/x", False),   # same canon
            ("http://a.test/p", "http://a.test/p/", False),  # self
            ("http://a.test/p", "http://c.test/y", True),    # nofollow
        ],
        "src string, dst string, nofollow boolean",
    )
    rows = link_edges(links).collect()
    assert [(r.src, r.dst) for r in rows] == [
        ("http://a.test/p", "http://b.test/x")
    ]


def _np_pagerank(edges, iters, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t in edges:
            nxt[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {u: r[idx[u]] for u in nodes}


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_numpy_and_sums_to_one(spark, iters):
    # c is dangling (no out-edges); b is a hub
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "b"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.rank for r in pagerank(df, iters=iters).collect()}
    want = _np_pagerank(edges, iters)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-6, u
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_anchor_topk_deterministic_ties(spark):
    links = spark.createDataFrame(
        [("s", "http://t.test/", "beta", False),
         ("s", "http://t.test/", "alpha", False),
         ("s", "http://t.test/", "alpha", False),
         ("s", "http://t.test/", "gamma", False),
         ("s", "http://t.test/", "", False)],
        "src string, dst string, anchor string, nofollow boolean",
    )
    rows = anchor_topk(links, k=2).collect()
    assert [(r.anchor, r.n, r.pos) for r in rows] == [
        ("alpha", 2, 1), ("beta", 1, 2)  # beta < gamma bytewise at n=1
    ]


def test_page_graph_fused_equals_two_pass(spark):
    pages = spark.createDataFrame(
        [("https://site.test/dir/page", bytearray(PAGE.encode()))],
        "url string, html binary",
    )
    from pdf_parser_spark.operators.graph import page_graph

    (g,) = page_graph(pages).collect()
    (m,) = page_metadata(pages).collect()
    assert (g.title, g.description, g.canonical, g.robots_noindex,
            g.robots_nofollow) == (m.title, m.description, m.canonical,
                                   m.robots_noindex, m.robots_nofollow)
    two_pass = {(r.dst, r.anchor, r.nofollow)
                for r in extract_links(pages).collect()}
    assert {(l.dst, l.anchor, l.nofollow) for l in g.links} == two_pass
    assert len(g.links) == m.n_links


def test_connected_components_facade(spark):
    from pdf_parser_spark.operators.graph import connected_components

    # two disjoint chains + an isolated self-loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (99, 99)],
        "src long, dst long",
    )
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def _np_hits(edges, iters):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    a = np.ones(len(nodes))
    h = np.ones(len(nodes))
    for _ in range(iters):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    return ({u: a[idx[u]] for u in nodes}, {u: h[idx[u]] for u in nodes})


@pytest.mark.parametrize("iters", [1, 3])
def test_hits_matches_numpy(spark, iters):
    from pdf_parser_spark.operators.graph import hits

    # h is a pure hub (points at everything, nothing points at it);
    # c is a pure authority (everything points at it)
    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "c"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: (r.auth, r.hub) for r in hits(df, iters=iters).collect()}
    want_a, want_h = _np_hits(edges, iters)
    assert set(got) == set(want_a)
    for u in want_a:
        assert abs(got[u][0] - want_a[u]) < 1e-6, u
        assert abs(got[u][1] - want_h[u]) < 1e-6, u
    # the structural ordering HITS exists to recover
    assert got["c"][0] == max(v[0] for v in got.values())  # top authority
    assert got["h"][1] == max(v[1] for v in got.values())  # top hub
    assert got["h"][0] == 0.0  # nothing points at the pure hub


# ------------------------------------------------- domain-level rollup

def _np_weighted_pagerank(wedges, iters, d=0.85):
    nodes = sorted({x for e in wedges for x in e[:2]})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _, w in wedges:
        out[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t, w in wedges:
            nxt[idx[t]] += r[idx[s]] * w / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {u: r[idx[u]] for u in nodes}


def test_domain_edges_rollup(spark):
    from pdf_parser_spark.operators.graph import domain_edges

    rows = (
        [(f"https://sub{i}.alpha.com/p{i}", "https://beta.co.uk/x")
         for i in range(3)]
        + [("https://alpha.com/a", "https://www.alpha.com/b")]  # intra
        + [("https://beta.co.uk/y", "https://gamma.org/z")] * 2
    )
    df = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(tuple(r) for r in domain_edges(df).collect())
    # subdomains fold to eTLD+1, intra-domain drops, multiplicity counts
    assert got == [
        ("alpha.com", "beta.co.uk", 3),
        ("beta.co.uk", "gamma.org", 2),
    ]


def test_weighted_pagerank_matches_numpy(spark):
    from pdf_parser_spark.operators.graph import pagerank

    wedges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 5.0),
              ("d", "a", 2.0), ("d", "b", 2.0)]
    df = spark.createDataFrame(wedges, "src string, dst string, w double")
    got = {r.id: r.rank
           for r in pagerank(df, weight_col="w", dedup=False).collect()}
    want = _np_weighted_pagerank(wedges, 3)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-6, u
    assert abs(sum(got.values()) - 1.0) < 1e-5
    # weight matters: a->b carries 3x a->c, so b outranks c's share
    # from a alone; compare against the unweighted ranking to prove
    # the weights changed the outcome
    unw = {r.id: r.rank for r in pagerank(df.select("src", "dst")).collect()}
    assert got != unw


def test_domain_rank_twin(spark):
    import duckdb

    from pdf_parser_spark.operators.graph import (
        domain_edges, domain_edges_sql, pagerank, pagerank_sql,
    )

    rows = []
    for i in range(40):
        s = f"https://s{i % 3}.d{i % 4}.com/p{i}"
        t = [f"https://d{(i + 1) % 4}.com/x", f"https://h{i % 2}.co.uk/y",
             f"https://d{i % 5}.org/z"][i % 3]
        rows.append((s, t))
    df = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(
        tuple(r)
        for r in pagerank(
            domain_edges(df), weight_col="w", dedup=False
        ).collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"('{s}', '{t}')" for s, t in rows)
    con.execute(
        f"CREATE TABLE uedges AS SELECT * FROM (VALUES {vals}) t(src, dst)"
    )
    want = sorted(con.execute(pagerank_sql(
        domain_edges_sql("SELECT * FROM uedges"), weight_col="w"
    )).fetchall())
    assert got == want and len(got) > 3
