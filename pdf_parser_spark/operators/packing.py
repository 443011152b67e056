"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines concatenate documents into fixed-length context
windows ("sample packing"); the assignment step — which documents
share a window — is a corpus-scale operator the reference app (a
per-request parser) has no counterpart for.

True first-fit-decreasing is inherently sequential (bin state threads
through every decision), so it neither parallelizes nor oracles. This
operator implements the standard SQL-expressible relaxation, BLOCK
packing: within a hash-group, documents are laid out in id order and
a document's bin is the block its running-token-offset starts in:

    bin_local = floor(exclusive_cumsum(n_tokens) / capacity)

Deterministic, window-expressible in both engines (the DuckDB twin is
the same window with an explicit ROWS frame), and the waste bound is
one straddling document per bin boundary. Documents longer than
`capacity` keep their starting bin and overflow it — upstream
splitting (the chunking tier, functions/chunk.py) is the real fix for
giants, as in production packers.

Scale (100 TB): a single global cumsum window is ONE task — the
anti-pattern. Packing instead runs per hash-group (`doc_id % n_groups`
— portable integer arithmetic, no md5 needed since group balance only
needs coarse uniformity): `n_groups` independent windows spread over
the cluster, one shuffle on the group key. Bins never cross groups;
`bin_id = group_id * 2^40 + bin_local` keeps ids globally unique.
Waste stays one boundary-straddler per bin regardless of grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import ws_token_count, ws_token_count_sql

#: bin_local headroom per group: 2^40 bins/group is unreachable
#: (capacity >= 1 token and int64 token offsets cap bins well below).
GROUP_STRIDE = 1 << 40


def pack_blocks(
    df: DataFrame,
    capacity: int,
    n_groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, group_id, bin_id, bin_offset): block packing
    of whitespace-token counts into `capacity`-token bins, per
    hash-group. `bin_offset` is the document's token offset inside its
    bin (the writer's copy position)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    toks = df.select(
        F.col(id_col),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
        (F.col(id_col) % n_groups).cast("long").alias("group_id"),
    )
    w = (
        Window.partitionBy("group_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return toks.select(
        id_col, "n_tokens", "group_id", start
    ).select(
        id_col,
        "n_tokens",
        "group_id",
        (F.col("group_id") * GROUP_STRIDE
         + F.floor(F.col("_start") / capacity)).alias("bin_id"),
        (F.col("_start") % capacity).alias("bin_offset"),
    )


def pack_blocks_sql(
    table: str,
    capacity: int,
    n_groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`pack_blocks` (same window, explicit ROWS
    frame so RANGE-vs-ROWS defaults can't diverge)."""
    nt = ws_token_count_sql(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col}, {nt} AS n_tokens,
         CAST({id_col} % {n_groups} AS BIGINT) AS group_id
  FROM {table}
),
laid AS (
  SELECT {id_col}, n_tokens, group_id,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY group_id ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS _start
  FROM toks
)
SELECT {id_col}, n_tokens, group_id,
       group_id * {GROUP_STRIDE} + CAST(floor(_start / {capacity}) AS BIGINT)
         AS bin_id,
       CAST(_start % {capacity} AS BIGINT) AS bin_offset
FROM laid
"""
