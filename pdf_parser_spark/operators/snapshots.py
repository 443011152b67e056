"""Crawl snapshot diff: what changed between two crawls.

An incremental crawl pipeline needs the delta between snapshot N and
snapshot N+1 of the same url space — which pages appeared, vanished,
or changed content — both to schedule refetches (changed/added urls
re-enter the frontier) and to bound recuration work (only the delta
flows into `jobs/curate.py`'s incremental path). The reference app is
per-request and has no snapshot concept; the CDX tier
(`sources/cdx.py`) answers "which capture is latest", this module
answers "what moved between two captures".

Scale (100 TB x 2 snapshots): content never crosses the wire — each
side reduces to (key, 16-byte md5 fingerprint) in its own map, and the
diff is ONE full-outer join on the key. With both snapshot tables
bucketed by the key (`jobs/bucketize.py`), the join runs
Exchange-free; otherwise it is one narrow shuffle. The stats rollup is
a 4-row aggregate with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: diff statuses, in the fixed report order
STATUSES = ("added", "changed", "removed", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: str = None,
) -> DataFrame:
    """(key, status, old_fp, new_fp): full-outer fingerprint diff of
    two snapshots. `status` is added / removed (key on one side only),
    changed / unchanged (fingerprints differ / match). Pass `fp_col`
    to diff a precomputed fingerprint column instead of md5(text) —
    e.g. the canonical-text hash the curation tier uses, so
    whitespace-only rewrites don't count as changes."""
    def fps(df: DataFrame, out: str) -> DataFrame:
        fp = F.col(fp_col) if fp_col else F.md5(F.col(text_col))
        return df.select(F.col(key_col), fp.alias(out))

    o = fps(old, "old_fp")
    n = fps(new, "new_fp")
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(key_col), status.alias("status"), "old_fp", "new_fp"
    )


def snapshot_diff_stats(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: str = None,
) -> DataFrame:
    """(status, n_urls): the 4-row change report — the refetch-rate /
    churn dashboard number and the size bound for incremental
    recuration."""
    return (
        snapshot_diff(old, new, key_col, text_col, fp_col)
        .groupBy("status")
        .agg(F.count("*").alias("n_urls"))
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: str = None,
) -> str:
    """DuckDB twin of :func:`snapshot_diff`; `old_sql`/`new_sql` are
    subqueries producing the snapshot tables."""
    fp = fp_col if fp_col else f"md5({text_col})"
    return f"""
WITH o AS (SELECT {key_col}, {fp} AS old_fp FROM ({old_sql})),
n AS (SELECT {key_col}, {fp} AS new_fp FROM ({new_sql}))
SELECT coalesce(o.{key_col}, n.{key_col}) AS {key_col},
       CASE WHEN o.old_fp IS NULL THEN 'added'
            WHEN n.new_fp IS NULL THEN 'removed'
            WHEN o.old_fp = n.new_fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.old_fp, n.new_fp
FROM o FULL OUTER JOIN n ON o.{key_col} = n.{key_col}
"""


def snapshot_diff_stats_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "url",
    text_col: str = "text",
    fp_col: str = None,
) -> str:
    """DuckDB twin of :func:`snapshot_diff_stats`."""
    inner = snapshot_diff_sql(old_sql, new_sql, key_col, text_col, fp_col)
    return (
        f"SELECT status, count(*) AS n_urls FROM ({inner}) "
        f"GROUP BY status"
    )
