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


# ----------------------------------------------- concat-and-chunk packing

def pack_concat(
    df: DataFrame,
    block: int,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pk",
) -> DataFrame:
    """GPT-style concat-and-chunk packing: the whole corpus is laid
    out as ONE token stream in a deterministic pseudo-random order
    (the md5-draw shuffle every sampler here uses) and cut into
    exact `block`-token windows — documents SPLIT at window
    boundaries, so there is zero padding waste (the other classic
    packing besides :func:`pack_blocks`' boundary-aligned bins).
    Output: one row per (document, window) segment —
    (doc_id, n_tokens, block_id, doc_from, seg_len, block_offset) —
    exactly what a shard writer needs to copy token ranges.
    Zero-token documents contribute no segments.

    Every document needs its EXACT global stream offset — a global
    cumulative sum. The naive single ORDER BY window is one task (the
    anti-pattern); this runs the textbook distributed prefix-sum
    instead: draws bucket the corpus (`bucket = draw % n_buckets`),
    per-bucket token totals (one <= n_buckets-row aggregate with
    map-side combine) cumsum on the driver into bucket base offsets,
    and a window per bucket adds the local exclusive cumsum — global
    offset = bucket base + local. One narrow shuffle of (id, draw,
    n_tokens); texts never move; the in-task sort is n/n_buckets rows,
    so size `n_buckets ~ corpus_rows / 10M` at scale (the stream
    order is bucket-major by construction, identical at any
    n_buckets' task layout). The twin replays the same composite
    order as one plain window."""
    if block < 1:
        raise ValueError(f"block must be >= 1, got {block}")
    from .sampling import hash_draw

    toks = df.select(
        F.col(id_col),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
        hash_draw(F.col(id_col), salt).alias("_draw"),
    ).withColumn("_bucket", F.col("_draw") % n_buckets)

    totals = {
        r["_bucket"]: r["t"]
        for r in toks.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    base, acc = {}, 0
    for b in sorted(totals):
        base[b] = acc
        acc += totals[b]
    if not base:
        return toks.sparkSession.createDataFrame(
            [], f"{id_col} long, n_tokens long, block_id long, "
                "doc_from long, seg_len long, block_offset long",
        )
    base_df = F.broadcast(
        toks.sparkSession.createDataFrame(
            [(int(b), int(v)) for b, v in base.items()],
            "_bucket long, _base long",
        )
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_draw", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = (
        toks.join(base_df, "_bucket")
        .select(
            id_col, "n_tokens",
            (F.col("_base") + F.sum("n_tokens").over(w)
             - F.col("n_tokens")).alias("_g"),
        )
        .where(F.col("n_tokens") > 0)
    )
    # integer division (not floor of a double quotient): token offsets
    # at 100 TB exceed 2^53, where double division loses exactness
    first_b = F.expr(f"_g DIV {int(block)}")
    last_b = F.expr(f"(_g + n_tokens - 1) DIV {int(block)}")
    seg = laid.select(
        id_col, "n_tokens", "_g",
        F.explode(F.sequence(first_b, last_b)).alias("block_id"),
    )
    blk_start = F.col("block_id") * block
    seg_from = F.greatest(blk_start - F.col("_g"), F.lit(0))
    seg_end = F.least(
        F.col("_g") + F.col("n_tokens"), blk_start + block
    )
    seg_start = F.greatest(F.col("_g"), blk_start)
    return seg.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("block_id").cast("long"),
        seg_from.cast("long").alias("doc_from"),
        (seg_end - seg_start).cast("long").alias("seg_len"),
        (seg_start - blk_start).cast("long").alias("block_offset"),
    )


def pack_concat_sql(
    table: str,
    block: int,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pk",
) -> str:
    """DuckDB twin of :func:`pack_concat`: the bucketed prefix-sum is
    provably one plain window over the composite (bucket, draw, id)
    order, so the twin uses exactly that."""
    from .sampling import hash_draw_sql

    nt = ws_token_count_sql(text_col)
    draw = hash_draw_sql(id_col, salt)
    return f"""
WITH toks AS (
  SELECT {id_col}, {nt} AS n_tokens, {draw} AS _draw,
         {draw} % {n_buckets} AS _bucket
  FROM {table}
),
laid AS (
  SELECT {id_col}, n_tokens,
         CAST(SUM(n_tokens) OVER (
           ORDER BY _bucket, _draw, {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS _g
  FROM toks
),
seg AS (
  SELECT {id_col}, n_tokens, _g,
         unnest(generate_series(
           _g // {block}, (_g + n_tokens - 1) // {block}
         )) AS block_id
  FROM laid WHERE n_tokens > 0
)
SELECT {id_col}, n_tokens, block_id,
       CAST(greatest(block_id * {block} - _g, 0) AS BIGINT) AS doc_from,
       CAST(least(_g + n_tokens, block_id * {block} + {block})
            - greatest(_g, block_id * {block}) AS BIGINT) AS seg_len,
       CAST(greatest(_g, block_id * {block})
            - block_id * {block} AS BIGINT) AS block_offset
FROM seg
"""
