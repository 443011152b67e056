"""Crawl-frontier scheduling: candidate URLs → a polite, deterministic
fetch plan.

A 10^12-URL frontier cannot be scheduled by a driver-side queue; the
plan must be a table: assign every URL a ``wave`` number such that
wave *k* contains AT MOST ONE url per host — a fetcher that issues
waves sequentially (or rate-limits within a wave) never hammers a
host, which is the politeness contract crawlers pair with robots.txt
(see sources/robots.py, RFC 9309).

Pipeline per call:
 1. dedupe candidate urls (a frontier is a set);
 2. optionally gate through a parsed robots rules table
    (:func:`~pdf_parser_spark.sources.robots.robots_allowed`) —
    denied urls never enter the plan;
 3. rank urls within each host by the repo's deterministic md5 draw
    (same (url, salt) → same rank across runs, resumes, and cluster
    sizes — a frontier that reshuffles on every planner restart
    re-fetches the wrong tail);
 4. ``wave = row_number()`` per host; optional ``per_host_limit``
    caps each host's share of the crawl round (the per-site quota
    every large crawl applies).

Scale: one shuffle on host.  With ``per_host_limit`` the heavy-host
problem is defused BEFORE the ranking window by the same
hash-threshold prune `stratified_sample` uses (exact top-n per host
without sorting a mega-host's full stratum in one task); without a
limit the per-host sort is inherent to the contract — documented, and
bounded in practice because real frontiers always set a quota.

Reference parity: none (the reference has no crawl tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sampling import hash_draw, hash_draw_sql, stratified_sample
from ..sources.robots import _HOST_RE, robots_allowed


def frontier_schedule(
    pages: DataFrame,
    rules: DataFrame = None,
    agent: str = "*",
    url_col: str = "url",
    per_host_limit: int = None,
    salt: str = "",
) -> DataFrame:
    """(url, host, wave) fetch plan — wave *k* holds at most one url
    per host; urls beyond ``per_host_limit`` waves are dropped."""
    p = pages.select(F.col(url_col).alias("url")).distinct()
    if rules is not None:
        p = (
            robots_allowed(p, rules, agent=agent)
            .where(F.col("allowed"))
            .select("url")
        )
    p = p.withColumn("host", F.lower(F.regexp_extract("url", _HOST_RE, 1)))
    if per_host_limit is not None:
        # exact top-`limit` per host by (draw, url) WITHOUT sorting
        # full host strata; ordering matches the wave window below.
        p = stratified_sample(
            p, per_host_limit, key_col="host", id_col="url", salt=salt
        )
    w = Window.partitionBy("host").orderBy(
        hash_draw(F.col("url"), salt), F.col("url")
    )
    return p.select(
        "url", "host", F.row_number().over(w).alias("wave")
    )


def frontier_schedule_sql(
    pages_sql: str,
    rules_sql: str = None,
    agent: str = "*",
    url_col: str = "url",
    per_host_limit: int = None,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`frontier_schedule` — the plain window +
    QUALIFY formulation the Spark side is provably equivalent to.
    ``pages_sql`` is a FROM-able relation; ``rules_sql`` (optional) a
    subquery producing (host, agent, rule, path)."""
    from ..sources.robots import robots_allowed_sql

    base = f"SELECT DISTINCT {url_col} AS url FROM {pages_sql}"
    if rules_sql is not None:
        base = (
            f"SELECT url FROM ("
            + robots_allowed_sql(f"({base})", rules_sql, agent=agent)
            + ") WHERE allowed"
        )
    limit = (
        f"QUALIFY wave <= {int(per_host_limit)}"
        if per_host_limit is not None
        else ""
    )
    return f"""
SELECT url, host,
       row_number() OVER (
         PARTITION BY host
         ORDER BY {hash_draw_sql('url', salt)}, url
       ) AS wave
FROM (
  SELECT url,
         lower(coalesce(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1), '')) AS host
  FROM ({base})
)
{limit}
"""
