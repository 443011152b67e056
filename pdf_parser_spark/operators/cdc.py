"""Content-defined chunking (gear-hash CDC — the LBFS/rsync family,
Muthitacharoen et al. SOSP 2001; gear hash per Xia et al. "Ddelta"/
FastCDC, USENIX ATC 2016): split text into variable-size chunks whose
BOUNDARIES are decided by content, not position, so an insertion near
the head of a re-crawled page shifts only the chunk it lands in —
every later chunk re-aligns and its hash re-matches. Fixed-size
blocks lose every block after the edit; this is the delta-dedup
primitive that, composed with `operators/snapshots.py`, stores a
re-crawl as "chunks we already have + the one that changed".

Algorithm: the gear rolling hash h_i = (2·h_{i-1} + G[b_i]) mod 2^20
(G = 256 deterministic 20-bit values), boundary wherever
h_i ≡ 0 (mod 2^avg_bits) → expected chunk length 2^avg_bits. Because
the left-shift drops contributions after 20 steps, h_i equals the
WINDOWED sum Σ_{j=i-19..i} G[b_j]·2^(i-j) mod 2^20 — a pure
function of the last 20 chars that BOTH engines evaluate with the
same integer arithmetic (no float, no overflow: terms < 2^39, sums
< 2^44).

Scale design (100 TB): chunking is ONE native array expression per
row — no explode, no window, no shuffle, no UDF; O(20·n) work inside
the projection. Chunk rows (doc_id, idx, start, length, md5) are
narrow; the texts themselves never move. (For multi-MB documents a
mapInPandas/numpy rolling evaluation of the same recurrence is the
drop-in alternative; the per-position slice form here is quadratic
in the 20-char window only, not the document.)

No min/max clamps (FastCDC's normalization) — kept out deliberately:
clamps couple a chunk's boundary to its predecessor's, weakening the
re-alignment property this exists for; the geometric tail of the
plain rule is acceptable at dedup granularity (documented deviation).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: modulus width of the gear hash state.
_STATE_BITS = 20
_MOD = 1 << _STATE_BITS
#: window length (= state bits: older contributions shift out).
_W = _STATE_BITS


def _gear_table() -> list:
    """256 deterministic 20-bit gear values from md5 — generated, not
    hand-typed, identical constants on both engines."""
    return [
        int(hashlib.md5(f"gear-{b}".encode()).hexdigest()[:5], 16)
        for b in range(256)
    ]


GEAR = _gear_table()


def _spark_h() -> str:
    """Windowed gear sum over the pre-resolved per-char gear array
    ``_gv`` — same hoisting as the DuckDB twin: substring-by-index
    inside the position loop is an O(n) UTF8 scan per call (O(n²)
    per document); resolving chars once via split makes the whole
    chunker O(window·n)."""
    # the BIGINT cast precedes the shift: element_at yields INT and an
    # int32 shiftleft WRAPS at bit 31 — the result would still be
    # correct only via the two's-complement `& mask` coincidence
    # (2^20 | 2^32), which the documented "terms < 2^39" math must
    # not depend on
    term = (
        "shiftleft(CAST(element_at(_gv, CAST(j AS INT)) AS BIGINT),"
        " CAST(i - j AS INT))"
    )
    return (
        f"aggregate(sequence(greatest(1, i - {_W - 1}), i),"
        f" CAST(0 AS BIGINT), (a, j) -> a + {term}) % {_MOD}"
    )


def _duck_h() -> str:
    """Windowed gear sum over the PRE-RESOLVED per-position gear
    list ``gv`` — resolving the 256-entry gear table per position
    FIRST matters enormously in DuckDB: a list literal inside the
    innermost lambda is re-constructed per (i, j) evaluation
    (measured 75 s → 2 s at sf0.01)."""
    term = f"(gv[j] * (CAST(1 AS BIGINT) << (i - j)))"
    return (
        f"list_sum(list_transform(generate_series("
        f"greatest(1, i - {_W - 1}), i), j -> {term})) % {_MOD}"
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_bits: int = 6,
) -> DataFrame:
    """(doc_id, chunk_idx, start, length, chunk_hash): content-defined
    chunks; start is 0-based, chunks concatenate back to the text
    exactly. avg_bits=6 → expected 64-char chunks."""
    if not 1 <= avg_bits <= _STATE_BITS:
        raise ValueError(f"avg_bits must be in [1, {_STATE_BITS}]")
    mask = (1 << avg_bits) - 1
    t = text_col
    gear = "array(" + ",".join(str(v) for v in GEAR) + ")"
    gv = (
        f"CASE WHEN length({t}) IS NULL OR length({t}) = 0"
        f" THEN array() ELSE transform(split({t}, ''),"
        f" c -> element_at({gear}, ascii(c) % 256 + 1)) END"
    )
    h = _spark_h()
    bounds = (
        # the empty-text guard matters: Spark's sequence(1, 0) is a
        # DESCENDING [1, 0], not empty
        "CASE WHEN size(_gv) = 0"
        " THEN array(CAST(0 AS BIGINT)) ELSE"
        " array_sort(array_distinct(concat(array(CAST(0 AS BIGINT)),"
        " filter(transform(sequence(1, size(_gv)),"
        " i -> CAST(i AS BIGINT)),"
        f" i -> ({h}) & {mask} = 0),"
        " array(CAST(size(_gv) AS BIGINT))))) END"
    )
    out = df.select(
        F.col(id_col),
        F.col(t).alias("_t"),
        F.expr(gv).alias("_gv"),
    ).select(
        F.col(id_col),
        F.col("_t"),
        F.expr(bounds).alias("_b"),
    ).select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                # same descending-sequence guard for 1-element bounds
                "CASE WHEN size(_b) < 2 THEN"
                " array() ELSE"
                " transform(sequence(1, size(_b) - 1),"
                " c -> struct(element_at(_b, c) AS start,"
                " element_at(_b, c + 1) - element_at(_b, c) AS length,"
                " md5(substring(_t, CAST(element_at(_b, c) AS INT) + 1,"
                " CAST(element_at(_b, c + 1) - element_at(_b, c) AS INT)))"
                " AS chunk_hash)) END"
            )
        ).alias("_i", "_c"),
    ).select(
        F.col(id_col),
        (F.col("_i") + 1).alias("chunk_idx"),
        F.col("_c.start").alias("start"),
        F.col("_c.length").alias("length"),
        F.col("_c.chunk_hash").alias("chunk_hash"),
    )
    return out.where(F.col("length") > 0)


def cdc_chunks_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_bits: int = 6,
) -> str:
    """DuckDB twin of :func:`cdc_chunks` — same gear constants, same
    windowed-sum formula, same bounds construction."""
    mask = (1 << avg_bits) - 1
    t = text_col
    h = _duck_h()
    gear = "[" + ",".join(str(v) for v in GEAR) + "]"
    bounds = (
        f"list_sort(list_distinct(list_concat(list_concat("
        f"[CAST(0 AS BIGINT)],"
        f" list_transform(list_filter(generate_series(1, len(gv)),"
        f" i -> ({h}) % {mask + 1} = 0), i -> CAST(i AS BIGINT))),"
        f" [CAST(len(gv) AS BIGINT)])))"
    )
    return f"""
WITH gvt AS (
  SELECT {id_col}, {t} AS _t,
         list_transform(generate_series(1, length({t})),
           p -> g[ascii(substring({t}, p, 1)) % 256 + 1]) AS gv
  FROM {table}, (SELECT {gear} AS g) consts
),
b AS MATERIALIZED (
  SELECT {id_col}, _t, {bounds} AS _b FROM gvt
),
x AS (
  SELECT {id_col}, _t, _b, unnest(generate_series(1, len(_b) - 1)) AS c
  FROM b
)
SELECT {id_col}, c AS chunk_idx, _b[c] AS start,
       _b[c + 1] - _b[c] AS length,
       md5(substring(_t, CAST(_b[c] AS INT) + 1,
                     CAST(_b[c + 1] - _b[c] AS INT))) AS chunk_hash
FROM x WHERE _b[c + 1] - _b[c] > 0"""


def chunk_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    avg_bits: int = 6,
) -> DataFrame:
    """The delta-storage bill between two crawls of one url space:
    per key, how many content-defined chunks the NEW snapshot adds /
    drops / shares with the old one, and the byte volumes — i.e.
    "storing this re-crawl costs bytes_added, not the page size",
    the rsync/LBFS accounting that motivates CDC. Composes with
    `operators/snapshots.py`: run the cheap fingerprint diff first
    and feed only `changed` keys here.

    Per side, chunk sets reduce map-side to (key, chunk_hash,
    length) — texts never shuffle; the delta is ONE full-outer join
    on (key, hash) of narrow rows + a per-key aggregate."""

    def chunkset(df: DataFrame, side: str) -> DataFrame:
        return (
            cdc_chunks(df, text_col, key_col, avg_bits)
            .groupBy(key_col, "chunk_hash")
            .agg(F.min("length").alias(f"len_{side}"))
        )

    o = chunkset(old, "o")
    n = chunkset(new, "n")
    j = o.join(n, [key_col, "chunk_hash"], "full_outer")
    in_old = F.col("len_o").isNotNull()
    in_new = F.col("len_n").isNotNull()
    return (
        j.groupBy(key_col)
        .agg(
            F.sum(F.when(in_new & ~in_old, 1).otherwise(0)).alias("n_added"),
            F.sum(F.when(in_old & ~in_new, 1).otherwise(0)).alias("n_removed"),
            F.sum(F.when(in_old & in_new, 1).otherwise(0)).alias("n_shared"),
            F.sum(F.when(in_new & ~in_old, F.col("len_n")).otherwise(0)
                  ).alias("bytes_added"),
            F.sum(F.when(in_old & in_new, F.col("len_n")).otherwise(0)
                  ).alias("bytes_shared"),
        )
    )


def chunk_delta_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "url",
    text_col: str = "text",
    avg_bits: int = 6,
) -> str:
    """DuckDB twin of :func:`chunk_delta` (``old_sql``/``new_sql``
    are queries producing (key, text))."""

    def cs(src: str, side: str) -> str:
        inner = cdc_chunks_sql(f"({src})", text_col, key_col, avg_bits)
        return (
            f"SELECT {key_col}, chunk_hash, min(length) AS len_{side}"
            f" FROM ({inner}) GROUP BY 1, 2"
        )

    return f"""
WITH co AS MATERIALIZED ({cs(old_sql, 'o')}),
cn AS MATERIALIZED ({cs(new_sql, 'n')}),
j AS (
  SELECT coalesce(co.{key_col}, cn.{key_col}) AS {key_col},
         co.len_o, cn.len_n
  FROM co FULL OUTER JOIN cn
    ON co.{key_col} = cn.{key_col} AND co.chunk_hash = cn.chunk_hash
)
SELECT {key_col},
       sum(CASE WHEN len_n IS NOT NULL AND len_o IS NULL
                THEN 1 ELSE 0 END) AS n_added,
       sum(CASE WHEN len_o IS NOT NULL AND len_n IS NULL
                THEN 1 ELSE 0 END) AS n_removed,
       sum(CASE WHEN len_o IS NOT NULL AND len_n IS NOT NULL
                THEN 1 ELSE 0 END) AS n_shared,
       sum(CASE WHEN len_n IS NOT NULL AND len_o IS NULL
                THEN len_n ELSE 0 END) AS bytes_added,
       sum(CASE WHEN len_o IS NOT NULL AND len_n IS NOT NULL
                THEN len_n ELSE 0 END) AS bytes_shared
FROM j GROUP BY 1"""


def cdc_chunks_py(text: str, avg_bits: int = 6) -> list:
    """Pure-Python reference (tests): [(start, length, md5hex)]."""
    mask = (1 << avg_bits) - 1
    h, bounds = 0, [0]
    for i, ch in enumerate(text, 1):
        h = (2 * h + GEAR[ord(ch) % 256]) % _MOD
        if h & mask == 0:
            bounds.append(i)
    if bounds[-1] != len(text):
        bounds.append(len(text))
    out = []
    for c in range(len(bounds) - 1):
        s, e = bounds[c], bounds[c + 1]
        if e > s:
            out.append(
                (s, e - s,
                 hashlib.md5(text[s:e].encode()).hexdigest())
            )
    return out
