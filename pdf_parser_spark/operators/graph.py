"""Crawl link graph: outlink extraction, edge table, PageRank,
anchor-text harvest.

Reference parity: none — the reference (`src/pdf_processor.py`) is a
per-request parser with no crawl tier. These operators supply the
graph-side quality signals a Common-Crawl-scale training-data
pipeline keys on publicly (link-based page quality, anchor-text
relevance, indexability filtering), built Spark-first:

- `extract_links` / `page_metadata`: Arrow-batched `mapInPandas`
  over the pages table — the parse is per-page Python (stdlib
  HTMLParser, `html/links.py`), the honest slow path shared with
  text extraction; payload bytes never shuffle (both run map-only
  on whatever partitioning the scan gives).
- `link_edges`: native projection composing the URL canonicalizer
  (`operators/urls.py`) — dedup at canonical-URL level, nofollow and
  self-links dropped; ONE distinct shuffle on (src, dst) strings.
- `pagerank`: damped PageRank with dangling-mass redistribution,
  iterated DataFrame joins (the `dedup_clusters` discipline:
  persisted edges, `localCheckpoint` per round so lineage stays
  flat). Each round = one join-side shuffle on src + one groupBy
  shuffle on dst + two 1-row aggregates broadcast back in-plan —
  no driver-side collect. Fixed iteration count so the DuckDB
  oracle can unroll rounds as CTEs (the Lloyd-kmeans pattern).
- `anchor_topk`: per-target top-k anchor texts; the rank filter is
  `row_number <= k` so Spark plans WindowGroupLimit (per-partition
  pre-prune before the Exchange).

Scale notes (10^12 edges): everything shuffles only URL strings /
8-byte ranks, never page bytes; PageRank's per-round cost is two
shuffles on the edge table — the canonical Pregel-on-DataFrames
shape; at real scale you'd bucket the edge table by src once and
reuse the layout across rounds (same plan, co-located joins).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..html.links import parse_page_links, resolve_href
from . import urls as ur

LINKS_SCHEMA = "src string, dst string, anchor string, nofollow boolean"

META_SCHEMA = (
    "url string, title string, description string, canonical string, "
    "robots_noindex boolean, robots_nofollow boolean, n_links int"
)


def _page_text(payload) -> str:
    if payload is None:
        return ""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        return bytes(payload).decode("utf-8", errors="replace")
    return str(payload)


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Pages → one row per crawlable outlink: (src, dst, anchor,
    nofollow) with dst RFC-3986-resolved against the page URL (and
    its ``<base href>`` when present). Map-only; malformed HTML
    salvages, it never drops the page's other links."""
    cols = pages.select(F.col(url_col).alias("u"), F.col(html_col).alias("h"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"src": [], "dst": [], "anchor": [], "nofollow": []}
            for u, h in zip(b["u"], b["h"]):
                page = parse_page_links(_page_text(h))
                for lk in page.links:
                    dst = resolve_href(u or "", lk.href, page.base)
                    if dst is None:
                        continue
                    out["src"].append(u)
                    out["dst"].append(dst)
                    out["anchor"].append(lk.anchor)
                    out["nofollow"].append(lk.nofollow)
            yield pd.DataFrame(out)

    return cols.mapInPandas(gen, schema=LINKS_SCHEMA)


def page_metadata(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Pages → head metadata: title, meta description, resolved
    canonical link, robots noindex/nofollow flags, crawlable-outlink
    count. Map-only, same parser pass as `extract_links`."""
    cols = pages.select(F.col(url_col).alias("u"), F.col(html_col).alias("h"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for u, h in zip(b["u"], b["h"]):
                p = parse_page_links(_page_text(h))
                n = sum(
                    1 for lk in p.links
                    if resolve_href(u or "", lk.href, p.base) is not None
                )
                canon = (
                    resolve_href(u or "", p.canonical, p.base)
                    if p.canonical else None
                )
                rows.append((u, p.title, p.description, canon,
                             p.robots_noindex, p.robots_nofollow, n))
            yield pd.DataFrame(rows, columns=[
                "url", "title", "description", "canonical",
                "robots_noindex", "robots_nofollow", "n_links",
            ])

    return cols.mapInPandas(gen, schema=META_SCHEMA)


PAGE_GRAPH_SCHEMA = (
    "url string, title string, description string, canonical string, "
    "robots_noindex boolean, robots_nofollow boolean, "
    "links array<struct<dst:string, anchor:string, nofollow:boolean>>"
)


def page_graph(pages: DataFrame, url_col: str = "url",
               html_col: str = "html") -> DataFrame:
    """Fused one-pass variant: head metadata AND resolved outlinks
    (as an array column) from a SINGLE parse of each page — use this
    when a pipeline needs both, instead of paying the HTML parse
    twice via `extract_links` + `page_metadata`. The links table is
    one native `explode` away; still map-only."""
    cols = pages.select(F.col(url_col).alias("u"), F.col(html_col).alias("h"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for u, h in zip(b["u"], b["h"]):
                p = parse_page_links(_page_text(h))
                links = [
                    (dst, lk.anchor, lk.nofollow)
                    for lk in p.links
                    if (dst := resolve_href(u or "", lk.href, p.base))
                    is not None
                ]
                canon = (
                    resolve_href(u or "", p.canonical, p.base)
                    if p.canonical else None
                )
                rows.append((u, p.title, p.description, canon,
                             p.robots_noindex, p.robots_nofollow, links))
            yield pd.DataFrame(rows, columns=[
                "url", "title", "description", "canonical",
                "robots_noindex", "robots_nofollow", "links",
            ])

    return cols.mapInPandas(gen, schema=PAGE_GRAPH_SCHEMA)


def link_edges(links: DataFrame, src_col: str = "src",
               dst_col: str = "dst") -> DataFrame:
    """Outlinks → canonical follow-edge table: both endpoints
    canonicalized (operators/urls.py), nofollow links and canonical
    self-links dropped, exact duplicates removed. ONE distinct
    shuffle on the (src, dst) pair."""
    e = links
    if "nofollow" in e.columns:
        e = e.where(~F.col("nofollow"))
    e = e.select(
        ur.canonical_url(F.col(src_col)).alias("src"),
        ur.canonical_url(F.col(dst_col)).alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst")).distinct()


def domain_edges(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Page-level edge table → registered-domain (eTLD+1) edge rollup
    (src, dst, w) with w = number of page links between the two
    domains — the Common-Crawl host/domain-ranking graph (the
    published CC webgraph is exactly this rollup; endpoints via
    operators/urls.py's PSL-subset eTLD+1). Intra-domain links and
    empty hosts drop; ONE partial-combine groupBy on narrow string
    pairs — the page-level multiplicity never reaches the reducer
    uncombined. Feed to :func:`pagerank` as
    ``pagerank(de, weight_col="w", dedup=False)`` (domain-level
    weighted PageRank) or to :func:`connected_components` for
    mirror-cluster discovery."""
    e = edges.select(
        ur.registered_domain(F.col(src_col)).alias("src"),
        ur.registered_domain(F.col(dst_col)).alias("dst"),
    )
    return (
        e.where((F.col("src") != F.col("dst"))
                & (F.col("src") != "") & (F.col("dst") != ""))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def domain_edges_sql(edges_sql: str, src_col: str = "src",
                     dst_col: str = "dst") -> str:
    """DuckDB twin of :func:`domain_edges`."""
    rs = ur.registered_domain_sql(src_col)
    rd = ur.registered_domain_sql(dst_col)
    return (
        f"SELECT src, dst, count(*) AS w FROM ("
        f"SELECT {rs} AS src, {rd} AS dst FROM ({edges_sql})"
        f") WHERE src <> dst AND src <> '' AND dst <> ''"
        f" GROUP BY src, dst"
    )


def pagerank_round(e: DataFrame, deg: DataFrame, nodes: DataFrame,
                   n1: DataFrame, ranks: DataFrame,
                   damping: float = 0.85,
                   weight_col: str = None,
                   teleport: DataFrame = None) -> DataFrame:
    """One PageRank iteration body (extracted so the plan of a round
    is inspectable — tests/test_graph_bucketed.py asserts the
    Exchange profile of this exact function over a bucketed edge
    table). Returns the next ranks frame, LAZY (the loop in
    `pagerank` checkpoints it). With ``weight_col``, a node's rank
    splits across out-edges proportionally to edge weight (``deg``
    must then hold sum-of-weights in ``od``). With ``teleport`` (an
    (id, s) frame), the restart goes to s instead of uniform 1/n and
    dangling mass follows it — the personalized form; ``nodes``/
    ``n1`` are unused then (one machinery, two update rules)."""
    share = (
        F.col("rank") * F.col(weight_col) / F.col("od")
        if weight_col else F.col("rank") / F.col("od")
    )
    contrib = (
        e.join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .groupBy("dst")
        .agg(F.sum(share).alias("c"))
    )
    dangling = ranks.join(
        deg.select(F.col("src").alias("id")), "id", "left_anti"
    ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))  # 1 row
    if teleport is not None:
        return (
            teleport
            .join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    (1.0 - damping) * F.col("s")
                    + damping * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dmass") * F.col("s")
                    )
                ).alias("rank"),
            )
        )
    return (
        nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(dangling))
        .select(
            "id",
            (
                (1.0 - damping) / F.col("n")
                + damping * (
                    F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("dmass") / F.col("n")
                )
            ).alias("rank"),
        )
    )


def pagerank(edges: DataFrame, src_col: str = "src",
             dst_col: str = "dst", iters: int = 3,
             damping: float = 0.85, dedup: bool = True,
             weight_col: str = None) -> DataFrame:
    """Damped PageRank over a directed edge table → (id, rank).

    Standard formulation: ranks start uniform 1/N; each round every
    node gets ``(1-d)/N + d * (sum of in-neighbor rank/out_degree +
    dangling_mass/N)`` where dangling_mass is the total rank parked
    on nodes with no out-edges (redistributed uniformly, so ranks
    sum to 1 every round). Fixed ``iters`` (deterministic schedule →
    CTE-unrollable oracle, `pagerank_sql`); rank rounded to 6 dp at
    the END only, so cross-engine float noise (~1e-15 per round)
    stays far below the output grain.

    ``dedup=False`` skips the in-operator distinct for edge tables
    already exactly deduped (`link_edges` output, or a bucketed edge
    table via :func:`pagerank_bucketed` — where the distinct's
    Exchange would also destroy the bucket layout's Exchange-free
    join property).

    ``weight_col`` switches to weighted PageRank (a node's rank
    splits across out-edges ∝ weight; out-"degree" = sum of weights)
    — the multiplicity-carrying :func:`domain_edges` rollup is the
    intended input, with ``dedup=False`` (the rollup already
    aggregated; a distinct over (src, dst, w) would be a no-op
    Exchange). The unweighted plan is untouched when None.
    """
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col:
        cols.append(F.col(weight_col).cast("double").alias(weight_col))
    e = edges.select(*cols)
    if dedup:
        e = e.distinct()
    e = e.persist()
    # registered-cache-free: released by caller or app end; edges
    # are read 2x per round — persisting is the point of the loop
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))  # 1 row
    od_agg = (
        F.sum(weight_col) if weight_col else F.count("*").cast("double")
    )
    deg = e.groupBy("src").agg(od_agg.alias("od"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    ).localCheckpoint()
    for _ in range(iters):
        ranks = pagerank_round(
            e, deg, nodes, n1, ranks, damping, weight_col
        ).localCheckpoint()  # flat lineage; one round materialized
    out = ranks.select("id", F.round("rank", 6).alias("rank"))
    e.unpersist()
    nodes.unpersist()
    return out


def pagerank_personalized(
    edges: DataFrame,
    seeds: list,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    dedup: bool = True,
) -> DataFrame:
    """Personalized PageRank (the seeded-teleport variant, Page et
    al. 1999 §6; Haveliwala WWW 2002 topic-sensitive form): random
    walks restart at the SEED set instead of uniformly, so rank mass
    concentrates in the seeds' neighborhoods — crawl seed-list
    expansion ("find pages endorsed from these trusted hubs", the
    TrustRank shape) and related-page discovery. Teleport vector
    s = 1/|S| on seeds present in the graph, 0 elsewhere; each round
    r = (1−d)·s + d·(contribs + dangling_mass·s); dangling mass
    returns to the seeds, so ranks still sum to 1.

    ``seeds`` is a driver-side literal list (a seed list is curated
    config, bounded by definition — raise if > 10k, use a join-based
    variant at that point). Same execution shape as :func:`pagerank`:
    persisted edges, 2 shuffles/round, in-plan 1-row broadcasts,
    localCheckpoint per round, 6 dp rounding at the end only.
    """
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if len(seeds) > 10_000:
        raise ValueError("seed list > 10k: use a join-based teleport")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if dedup:
        e = e.distinct()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    is_seed = F.col("id").isin(list(seeds))
    # one driver-side count serves validation AND the teleport weight
    # (the seed list is driver-side config already; 1.0/k as a
    # literal is the same double the in-plan division produced)
    k = nodes.where(is_seed).count()
    if k == 0:
        e.unpersist(); nodes.unpersist()
        raise ValueError("no seed is present in the graph")
    sv = nodes.select(
        "id",
        F.when(is_seed, F.lit(1.0 / k)).otherwise(0.0).alias("s"),
    ).localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("od"))
    ranks = sv.select("id", F.col("s").alias("rank")).localCheckpoint()
    for _ in range(iters):
        ranks = pagerank_round(
            e, deg, None, None, ranks, damping, teleport=sv
        ).localCheckpoint()  # flat lineage; one round materialized
    out = ranks.select("id", F.round("rank", 6).alias("rank"))
    e.unpersist()
    nodes.unpersist()
    return out


def pagerank_personalized_sql(
    edges_sql: str, seeds: list, iters: int = 3, damping: float = 0.85
) -> str:
    """DuckDB twin of :func:`pagerank_personalized` (CTE-unrolled
    rounds; seeds embedded as literals)."""
    d = f"CAST({damping!r} AS DOUBLE)"
    quoted = ", ".join(
        str(s) if isinstance(s, (int, float))
        else "'" + str(s).replace("'", "''") + "'"
        for s in seeds
    )
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)",
        f"ks AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM nodes"
        f" WHERE id IN ({quoted}))",
        f"sv AS (SELECT id, CASE WHEN id IN ({quoted})"
        f" THEN 1.0 / (SELECT k FROM ks) ELSE 0.0 END AS s FROM nodes)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od"
        " FROM e GROUP BY src)",
        "r0 AS (SELECT id, s AS rank FROM sv)",
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"c{i} AS (SELECT e.dst AS id, sum(r.rank / d.od) AS c FROM e"
            f" JOIN {p} r ON e.src = r.id JOIN deg d ON e.src = d.src"
            f" GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(rank), 0.0) AS dmass FROM {p}"
            f" WHERE id NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"r{i} AS (SELECT sv.id,"
            f" (1.0 - {d}) * sv.s"
            f" + {d} * (coalesce(c.c, 0.0)"
            f" + (SELECT dmass FROM d{i}) * sv.s) AS rank"
            f" FROM sv LEFT JOIN c{i} c ON sv.id = c.id)"
        )
    parts_sql = ",\n".join(parts)
    return f"{parts_sql}\nSELECT id, round(rank, 6) AS rank FROM r{iters}"


def pagerank_bucketed(spark, edges_table: str, iters: int = 3,
                      damping: float = 0.85) -> DataFrame:
    """PageRank over a src-BUCKETED catalog edge table — the
    jobs/bucketize.py composition: ``write_bucketed(link_edges(...),
    table, key="src")`` pays the src-shuffle ONCE at write time, and
    every one of the ``iters`` rounds then reads the bucket spec from
    the catalog and runs its contrib join and out-degree aggregate
    with NO Exchange on the edge side (plan-asserted by
    tests/test_graph_bucketed.py). At 10^12 edges this removes the
    dominant per-round shuffle — what still moves each round is the
    small (id, rank) frame and the transpose groupBy(dst).

    The table must hold exact-deduped edges (`link_edges` output is
    distinct by construction); the in-operator distinct is skipped —
    its Exchange would both re-shuffle the edges and hide the bucket
    layout from the join planner.
    """
    return pagerank(spark.table(edges_table), iters=iters,
                    damping=damping, dedup=False)


def pagerank_sql(edges_sql: str, iters: int = 3,
                 damping: float = 0.85, weight_col: str = None) -> str:
    """DuckDB twin of :func:`pagerank`: the fixed iteration schedule
    unrolled as CTEs (the Lloyd-kmeans oracle pattern), one
    contrib/dangling/rank triple per round. ``edges_sql`` is a query
    producing (src, dst) — plus the weight column for the weighted
    form (then no DISTINCT, mirroring ``dedup=False``)."""
    # CAST keeps every literal in DOUBLE space — DuckDB decimal
    # literals would otherwise produce DECIMAL arithmetic that drifts
    # from Spark's IEEE doubles at the hash grain.
    d = f"CAST({damping!r} AS DOUBLE)"
    if weight_col:
        e_cte = (
            f"WITH e AS (SELECT src, dst,"
            f" CAST({weight_col} AS DOUBLE) AS w FROM ({edges_sql}))"
        )
        od = "sum(w)"
        share = "r.rank * e.w / d.od"
    else:
        e_cte = f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))"
        od = "CAST(count(*) AS DOUBLE)"
        share = "r.rank / d.od"
    parts = [
        e_cte,
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        f"deg AS (SELECT src, {od} AS od FROM e GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"c{i} AS (SELECT e.dst AS id, sum({share}) AS c FROM e"
            f" JOIN {p} r ON e.src = r.id JOIN deg d ON e.src = d.src"
            f" GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(rank), 0.0) AS dmass FROM {p}"
            f" WHERE id NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.id,"
            f" (1.0 - {d}) / (SELECT n FROM nn)"
            f" + {d} * (coalesce(c.c, 0.0)"
            f" + (SELECT dmass FROM d{i}) / (SELECT n FROM nn)) AS rank"
            f" FROM nodes LEFT JOIN c{i} c ON nodes.id = c.id)"
        )
    parts_sql = ",\n".join(parts)
    return f"{parts_sql}\nSELECT id, round(rank, 6) AS rank FROM r{iters}"


def hits(edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
         iters: int = 3, dedup: bool = True) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) over a directed
    edge table → (id, auth, hub) — the link-analysis complement to
    :func:`pagerank`: PageRank scores global endorsement flow, HITS
    separates pages that ARE good sources (authorities) from pages
    that POINT at good sources (hubs) — directory/listing pages,
    which a crawl seed-selection step wants ranked on their own axis.

    Per round: auth = L1-normalized sum of in-neighbor hub scores,
    then hub = L1-normalized sum of out-neighbor AUTH scores (the
    sequential update of the original paper). L1 normalization
    (divide by the score sum, an in-plan 1-row broadcast) keeps the
    arithmetic engine-portable — an L2 norm's sqrt would put libm
    noise above the 6-dp output grain. Fixed ``iters`` → the DuckDB
    twin (:func:`hits_sql`) unrolls rounds as CTEs, the pagerank /
    Lloyd idiom. Same scale shape as pagerank: edges persisted, two
    key shuffles per round, scores-frame joins only; compose with a
    src/dst-bucketed edge table to remove the per-round edge
    Exchange exactly as :func:`pagerank_bucketed` does.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if dedup:
        e = e.distinct()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    scores = nodes.select(
        "id", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub")
    ).localCheckpoint()
    for _ in range(iters):
        a_raw = (
            e.join(
                scores.select(F.col("id").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
        )
        a = nodes.join(
            a_raw.withColumnRenamed("dst", "id"), "id", "left"
        ).select("id", F.coalesce(F.col("a_raw"), F.lit(0.0)).alias("a_raw"))
        a_norm = a.agg(F.sum("a_raw").alias("s"))  # 1 row
        a = a.crossJoin(F.broadcast(a_norm)).select(
            "id", (F.col("a_raw") / F.col("s")).alias("auth")
        )
        h_raw = (
            e.join(a.select(F.col("id").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("h_raw"))
        )
        h = nodes.join(
            h_raw.withColumnRenamed("src", "id"), "id", "left"
        ).select("id", F.coalesce(F.col("h_raw"), F.lit(0.0)).alias("h_raw"))
        h_norm = h.agg(F.sum("h_raw").alias("s"))  # 1 row
        h = h.crossJoin(F.broadcast(h_norm)).select(
            "id", (F.col("h_raw") / F.col("s")).alias("hub")
        )
        scores = a.join(h, "id").localCheckpoint()
    out = scores.select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )
    e.unpersist()
    nodes.unpersist()
    return out


def hits_sql(edges_sql: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`hits`: rounds unrolled as CTEs;
    ``edges_sql`` produces (src, dst). Every per-round CTE is
    AS MATERIALIZED — each is referenced 2-3 times by the next
    level, so DuckDB's default inlining re-expands the whole chain
    exponentially in `iters` (the curate-oracle lesson; unmaterialized
    this twin ran minutes, materialized it runs milliseconds)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst"
        f" FROM ({edges_sql}))",
        "nodes AS MATERIALIZED"
        " (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)",
        "s0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS auth,"
        " CAST(1.0 AS DOUBLE) AS hub FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = f"s{i - 1}"
        parts.append(
            f"ar{i} AS MATERIALIZED"
            f" (SELECT nodes.id, coalesce(x.a_raw, 0.0) AS a_raw"
            f" FROM nodes LEFT JOIN (SELECT e.dst AS id, sum(s.hub) AS a_raw"
            f" FROM e JOIN {p} s ON e.src = s.id GROUP BY e.dst) x"
            f" ON nodes.id = x.id)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED"
            f" (SELECT id, a_raw / (SELECT sum(a_raw) FROM ar{i})"
            f" AS auth FROM ar{i})"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED"
            f" (SELECT nodes.id, coalesce(x.h_raw, 0.0) AS h_raw"
            f" FROM nodes LEFT JOIN (SELECT e.src AS id, sum(a.auth) AS h_raw"
            f" FROM e JOIN a{i} a ON e.dst = a.id GROUP BY e.src) x"
            f" ON nodes.id = x.id)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT a.id, a.auth,"
            f" h.h_raw / (SELECT sum(h_raw) FROM hr{i}) AS hub"
            f" FROM a{i} a JOIN hr{i} h ON a.id = h.id)"
        )
    parts_sql = ",\n".join(parts)
    return (
        f"{parts_sql}\nSELECT id, round(auth, 6) AS auth,"
        f" round(hub, 6) AS hub FROM s{iters}"
    )


def anchor_topk(links: DataFrame, k: int = 3,
                dst_col: str = "dst") -> DataFrame:
    """Per-target top-k anchor texts by frequency → (dst, anchor,
    n, pos). Targets canonicalized; empty anchors dropped; ties
    broken bytewise on anchor so the ranking is deterministic across
    engines. The `row_number <= k` filter plans WindowGroupLimit
    (per-partition pre-prune before the Exchange)."""
    a = links.select(
        ur.canonical_url(F.col(dst_col)).alias("dst"),
        F.col("anchor"),
    ).where(F.col("anchor") != "")
    counts = a.groupBy("dst", "anchor").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        counts.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
    )


# -------------------------------------------------- connected components

def connected_components(edges: DataFrame, src_col: str = "src",
                         dst_col: str = "dst") -> DataFrame:
    """Undirected connected components over an edge table →
    (node, component) with component = the minimum node id reachable.
    Thin graph-tier facade over `operators/dedup.py::dedup_clusters`
    — the SAME convergent pointer-jumping min-label propagation that
    clusters near-dup documents clusters hosts/domains (O(log
    diameter) rounds, 8-byte ids only on the wire; see that docstring
    for the full scale argument).  Typical use: mirror-site discovery
    over `link_edges` lifted to `registered_domain` endpoints."""
    from . import dedup as _dedup

    pairs = edges.select(
        F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b")
    )
    return _dedup.dedup_clusters(pairs).select(
        F.col("doc_id").alias("node"),
        F.col("cluster_id").alias("component"),
    )


def connected_components_sql(edges_sql: str, src_col: str = "src",
                             dst_col: str = "dst") -> str:
    """DuckDB twin of :func:`connected_components` (exact recursive
    reachability — semantics, not schedule)."""
    from . import dedup as _dedup

    pairs = (
        f"SELECT {src_col} AS id_a, {dst_col} AS id_b FROM ({edges_sql})"
    )
    return (
        "SELECT doc_id AS node, cluster_id AS component FROM ("
        + _dedup.dedup_clusters_sql(pairs)
        + ")"
    )
