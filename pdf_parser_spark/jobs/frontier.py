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


def crawl_budgets(
    ranks: DataFrame,
    total_budget: int,
    beta: float = 1.0,
    min_pages: int = 1,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-proportional per-domain crawl budgets: (id, budget) with
    budget_i = max(min_pages, floor(total · w_i / Σw)), w = rank^beta
    — how a crawl actually spends its page budget across domains
    once `domain_rank` has scored them (beta<1 flattens the head,
    the temperature_mix rationale; Cho & Garcia-Molina's
    quality-driven allocation shape).

    Cross-engine determinism: the 6-dp rank goes through the
    correctly-rounded beta cases (sqrt/identity/square — same double
    both engines), is floored into integer micro-weights, and ALL
    remaining arithmetic (Σw, total·w/Σw) is bigint — no float sum
    whose accumulation order could flip a floor. Floor residue stays
    unallocated (≤ n_domains pages, deterministic). One narrow
    aggregate + a broadcast 1-row total; map-only otherwise.

    ``min_pages`` is a PER-DOMAIN floor, not a reallocation: when many
    low-rank domains floor up, Σ budget_i can EXCEED ``total_budget``
    (worst case n_domains · min_pages) — the politeness-floor
    semantics a crawl wants; callers needing a hard global cap pass
    ``min_pages=0`` or size the budget ≥ n · min_pages. If every
    rank's micro-weight floors to zero (Σw = 0) the job raises
    rather than dividing by zero."""
    if total_budget <= 0:
        raise ValueError("total_budget must be positive")
    if beta == 1.0:
        wexpr = F.col(rank_col)
    elif beta == 0.5:
        wexpr = F.sqrt(F.col(rank_col))
    elif beta == 2.0:
        wexpr = F.col(rank_col) * F.col(rank_col)
    else:
        raise ValueError("beta must be one of 1.0, 0.5, 2.0 "
                         "(correctly-rounded cross-engine cases)")
    w = ranks.select(
        F.col(id_col),
        F.floor(wexpr * F.lit(1_000_000.0)).cast("bigint").alias("_w"),
    )
    tot = w.agg(F.sum("_w").alias("_tw"))  # 1 row, bigint-exact
    # executor-side guard: all-zero micro-weights would otherwise be a
    # bigint division by zero (NULL budgets) — fail loudly instead
    tot = tot.where(
        F.assert_true(
            F.col("_tw") > 0,
            F.lit("crawl_budgets: all rank micro-weights are zero"),
        ).isNull()
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            F.greatest(
                F.lit(min_pages).cast("bigint"),
                # true integer division (DIV) — a float divide would
                # lose exactness once total·w passes 2^53
                F.expr(
                    f"CAST({int(total_budget)} AS BIGINT) * _w DIV _tw"
                ),
            ).alias("budget"),
        )
    )


def crawl_budgets_sql(
    ranks_sql: str,
    total_budget: int,
    beta: float = 1.0,
    min_pages: int = 1,
    id_col: str = "id",
    rank_col: str = "rank",
) -> str:
    """DuckDB twin of :func:`crawl_budgets` (``ranks_sql`` produces
    (id, rank))."""
    if beta == 1.0:
        wexpr = rank_col
    elif beta == 0.5:
        wexpr = f"sqrt({rank_col})"
    elif beta == 2.0:
        wexpr = f"({rank_col} * {rank_col})"
    else:
        raise ValueError("beta must be one of 1.0, 0.5, 2.0")
    return f"""
WITH w AS (
  SELECT {id_col},
         CAST(floor({wexpr} * 1000000.0) AS BIGINT) AS w
  FROM ({ranks_sql})
),
tot AS (SELECT SUM(w) AS tw FROM w)
SELECT {id_col},
       greatest(CAST({min_pages} AS BIGINT),
                (CAST({total_budget} AS BIGINT) * w)
                  // (SELECT tw FROM tot)) AS budget
FROM w"""
