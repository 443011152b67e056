"""Count-min sketch: fixed-memory frequency estimation over unbounded
token streams (Cormode & Muthukrishnan, J. Algorithms 2005) — the
sketch a telemetry pipeline keeps when exact `domain_stats`-style
aggregation is too wide (estimate >= truth always; over-estimate
probability shrinks geometrically with depth).

Spark-first decomposition:

- Build: explode tokens once, fan each token into its `depth` salted
  (row, col) cells (pure md5 arithmetic via the shared
  `sampling.hash_draw` idiom), then ONE partial-aggregated groupBy on
  the cell key.  The shuffle carries only (smallint, int, partial
  count) triples capped at depth x width distinct keys — at 100 TB
  the map-side combine reduces each partition to <= depth*width rows
  before the exchange, so the sketch build is effectively map-only.
- Sketches MERGE by cell-wise addition (a union + the same groupBy),
  which is what makes them right for incremental/streaming corpora.
- Estimate: the query terms' cells are computed as literals and the
  tiny term-cell frame is broadcast against the sketch; missing cells
  count 0; the estimate is the row-wise MIN.

DuckDB twins share the md5 cell arithmetic bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_draw, hash_draw_sql

#: independent hash rows; P(over-estimate by > eps*N) ~ exp(-depth).
DEFAULT_DEPTH = 4
#: cells per row; expected over-count per cell ~ N / width.
DEFAULT_WIDTH = 1024


def _tokens(col: Column, lowercase: bool) -> Column:
    t = F.lower(col) if lowercase else col
    return F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")


def _tokens_sql(col: str, lowercase: bool) -> str:
    t = f"lower({col})" if lowercase else col
    return (
        f"list_filter(string_split_regex(trim({t}), '\\s+'), w -> w <> '')"
    )


def _cell(tok: Column, row: int, width: int, salt: str) -> Column:
    return hash_draw(tok, f"{salt}:{row}#") % width


def _cell_sql(tok: str, row: int, width: int, salt: str) -> str:
    return f"{hash_draw_sql(tok, f'{salt}:{row}#')} % {width}"


def cms_build(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
    lowercase: bool = True,
) -> DataFrame:
    """Token-frequency sketch of a corpus: (row, col, c) with at most
    depth x width rows, whatever the corpus size."""
    tok = F.explode(_tokens(F.col(text_col), lowercase)).alias("tok")
    cells = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                _cell(F.col("tok"), r, width, salt).alias("col"),
            )
            for r in range(depth)
        ])
    ).alias("cell")
    return (
        docs.select(tok)
        .select(cells)
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("c"))
    )


def cms_build_sql(
    table: str,
    text_col: str = "text",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
    lowercase: bool = True,
) -> str:
    structs = ", ".join(
        f"{{'row': {r}, 'col': {_cell_sql('tok', r, width, salt)}}}"
        for r in range(depth)
    )
    return f"""
  SELECT cell['row'] AS row, cell['col'] AS col, count(*) AS c
  FROM (SELECT unnest([{structs}]) AS cell
        FROM (SELECT unnest({_tokens_sql(text_col, lowercase)}) AS tok
              FROM {table}))
  GROUP BY 1, 2
"""


def cms_estimate(
    cms: DataFrame,
    terms: Sequence[str],
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """(term, est) for each query term: min over the term's depth
    cells, absent cells counting 0.  Both join sides are tiny by
    construction — the sketch is bounded at depth x width rows, so
    Spark broadcasts it under the literal term-cell frame (a
    broadcast hint on the left of a left-outer join is ignored;
    the bounded-sketch broadcast is the correct plan anyway)."""
    spark = cms.sparkSession
    rows = [
        (t, r) for t in terms for r in range(depth)
    ]
    # each (term, row) pair hashes with ITS row's salt
    cells = spark.createDataFrame(rows, "term string, row int")
    col_expr = None
    for r in range(depth):
        c = _cell(F.col("term"), r, width, salt)
        col_expr = (
            F.when(F.col("row") == r, c)
            if col_expr is None
            else col_expr.when(F.col("row") == r, c)
        )
    cells = cells.select("term", "row", col_expr.alias("col"))
    joined = cells.join(F.broadcast(cms), ["row", "col"], "left")
    return (
        joined.groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def cms_estimate_sql(
    cms_sql: str,
    terms: Sequence[str],
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> str:
    term_rows = ", ".join(
        f"('{t}', {r})" for t in terms for r in range(depth)
    )
    col_case = " ".join(
        f"WHEN row = {r} THEN {_cell_sql('term', r, width, salt)}"
        for r in range(depth)
    )
    return f"""
WITH cms AS MATERIALIZED ({cms_sql}),
cells AS (
  SELECT term, row, CASE {col_case} END AS col
  FROM (VALUES {term_rows}) AS t(term, row)
)
SELECT term, min(coalesce(c, 0)) AS est
FROM cells LEFT JOIN cms USING (row, col)
GROUP BY term
"""


# ------------------------------------------------------------ hyperloglog

#: max tracked trailing-zero run; 2^-40 granularity keeps the register
#: sum EXACT in a double (<= 2^13 buckets x 40-bit fractions < 53-bit
#: mantissa), so the estimate is bit-deterministic across engines and
#: aggregation orders.
_HLL_MAX_RHO = 40


def _rho(draw: Column) -> Column:
    """rho = 1 + trailing-zero count of the 60-bit draw (the classic
    'position of the leftmost 1' on the reversed bit order — the
    distribution is what matters), capped at _HLL_MAX_RHO + 1."""
    out = F.lit(_HLL_MAX_RHO + 1)
    for i in range(_HLL_MAX_RHO, 0, -1):
        out = F.when(
            draw % F.lit(1 << i) == F.lit(1 << (i - 1)), F.lit(i)
        ).otherwise(out)
    return out


def _rho_sql(draw: str) -> str:
    cases = " ".join(
        f"WHEN ({draw}) % {1 << i} = {1 << (i - 1)} THEN {i}"
        for i in range(1, _HLL_MAX_RHO + 1)
    )
    return f"CASE {cases} ELSE {_HLL_MAX_RHO + 1} END"


def hll_distinct(
    df: DataFrame,
    col: str,
    b: int = 9,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog distinct-count estimate of a column (Flajolet,
    Fusy, Gandouet & Meunier, AofA 2007): ONE groupBy on the m = 2^b
    bucket ids (max-combinable map-side, <= m rows out) + a 1-row
    final aggregate.  This is the cross-engine-checkable twin of
    Spark's own `approx_count_distinct` (same algorithm family;
    HLL++'s bias tables are not reproducible in portable SQL, this
    is) — returns (hll_est, n_buckets, n_empty).

    Includes the small-range linear-counting correction; the 2^32
    large-range correction is irrelevant at a 60-bit hash and omitted.
    Requires b >= 7 so the single alpha formula applies.
    """
    if b < 7:
        raise ValueError(f"b must be >= 7, got {b}")
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    c = F.col(col)
    regs = (
        df.select(
            (hash_draw(c, f"{salt}B#") % m).alias("bucket"),
            _rho(hash_draw(c, f"{salt}R#")).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("mreg"))
    )
    denom = (
        F.sum(F.pow(F.lit(2.0), -F.col("mreg"))) + (m - F.count("*"))
    )
    zeros = (F.lit(m) - F.count("*")).cast("double")
    raw = F.lit(alpha * m * m) / denom
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return regs.agg(
        F.round(est, 4).alias("hll_est"),
        F.lit(m).alias("n_buckets"),
        (F.lit(m) - F.count("*")).alias("n_empty"),
    )


def hll_distinct_sql(
    table_sql: str,
    col: str,
    b: int = 9,
    salt: str = "hll",
) -> str:
    """DuckDB twin of :func:`hll_distinct` (identical arithmetic)."""
    if b < 7:
        raise ValueError(f"b must be >= 7, got {b}")
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    bucket = f"{hash_draw_sql(col, f'{salt}B#')} % {m}"
    rho = _rho_sql(hash_draw_sql(col, f"{salt}R#"))
    return f"""
WITH regs AS MATERIALIZED (
  SELECT bucket, max(rho) AS mreg
  FROM (SELECT {bucket} AS bucket, {rho} AS rho FROM ({table_sql}))
  GROUP BY bucket
)
SELECT round(CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m}
                  / (sum(pow(2.0, -mreg)) + ({m} - count(*)))
                  <= 2.5 * {m}
              AND {m} - count(*) > 0
             THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE)
                  / CAST({m} - count(*) AS DOUBLE))
             ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m}
                  / (sum(pow(2.0, -mreg)) + ({m} - count(*)))
        END, 4) AS hll_est,
       {m} AS n_buckets,
       {m} - count(*) AS n_empty
FROM regs
"""


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two same-shaped sketches (the incremental /
    multi-epoch composition property)."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("c").alias("c"))
    )


# ---------------------------------------------------------------- histogram

def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bin, lo_edge,
    hi_edge, n) with bin -1 / ``n_bins`` as the under/overflow
    buckets.  The groupBy is capped at n_bins + 2 distinct keys, so
    map-side combine collapses every task to a constant-size partial
    — like the count-min build, effectively map-only at 100 TB.
    Edges are exact ``lo + bin * width`` doubles on both engines.
    """
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (float(hi) - float(lo)) / int(n_bins)
    x = F.col(col).cast("double")
    b = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("long")
    b = (
        F.when(x < lo, F.lit(-1))
        .when(x >= hi, F.lit(int(n_bins)))
        .otherwise(F.least(b, F.lit(int(n_bins) - 1)))
    )
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.lit(float(lo)) + F.col("bin") * F.lit(width), 6)
            .alias("lo_edge"),
            F.round(F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width), 6)
            .alias("hi_edge"),
            "n",
        )
    )


def histogram_sql(
    table_sql: str,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> str:
    """DuckDB twin of :func:`histogram` (identical edge arithmetic)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (float(hi) - float(lo)) / int(n_bins)
    x = f"CAST({col} AS DOUBLE)"
    b = (
        f"CASE WHEN {x} < CAST({lo!r} AS DOUBLE) THEN -1 "
        f"WHEN {x} >= CAST({hi!r} AS DOUBLE) THEN {int(n_bins)} "
        f"ELSE least(CAST(floor(({x} - CAST({lo!r} AS DOUBLE)) "
        f"/ CAST({width!r} AS DOUBLE)) AS BIGINT), {int(n_bins) - 1}) END"
    )
    return f"""
  SELECT bin,
         round(CAST({lo!r} AS DOUBLE) + bin * CAST({width!r} AS DOUBLE), 6)
           AS lo_edge,
         round(CAST({lo!r} AS DOUBLE) + (bin + 1) * CAST({width!r} AS DOUBLE), 6)
           AS hi_edge,
         n
  FROM (SELECT {b} AS bin, count(*) AS n FROM ({table_sql}) GROUP BY 1)
"""


def hist_quantiles(
    hist: DataFrame,
    qs: Sequence[float],
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a :func:`histogram` frame (same
    ``n_bins``): for each q, walk the cumulative counts to the first
    bin holding rank ``q * N`` and interpolate linearly inside it —
    the classic Prometheus/HDR `histogram_quantile`.  Deterministic
    (no sampling, no engine-specific percentile), error bounded by
    one bin width; the under/overflow bins clamp to their one finite
    edge.  The input is already <= n_bins + 2 rows, so every step
    here is a broadcast-size plan whatever corpus built the
    histogram.  Quantiles must satisfy 0 < q <= 1 (q=0 has no
    holding bin by the rank rule; use the histogram's min edge).
    """
    if any(not 0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {list(qs)}")
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin", "lo_edge", "hi_edge", "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    qf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = (
        qf.crossJoin(cum)
        .where(
            (F.col("cum") >= F.col("q") * F.col("total"))
            & (F.col("cum") - F.col("n") < F.col("q") * F.col("total"))
        )
    )
    frac = (
        F.col("q") * F.col("total") - (F.col("cum") - F.col("n"))
    ) / F.col("n")
    est = (
        F.when(F.col("bin") == -1, F.col("hi_edge"))
        .when(F.col("bin") == int(n_bins), F.col("lo_edge"))
        .otherwise(
            F.col("lo_edge")
            + frac * (F.col("hi_edge") - F.col("lo_edge"))
        )
    )
    return hit.select(
        "q",
        F.round(est, 6).alias("est"),
        F.col("bin").alias("est_bin"),
    )


def hist_quantiles_sql(
    hist_sql: str,
    qs: Sequence[float],
    n_bins: int = 64,
) -> str:
    """DuckDB twin of :func:`hist_quantiles`."""
    # DuckDB parses bare decimal literals as DECIMAL; the Spark side
    # is DOUBLE, so cast (the repo-wide decimal-literal pitfall)
    q_rows = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in qs)
    return f"""
WITH hist AS MATERIALIZED ({hist_sql}),
cum AS (
  SELECT bin, lo_edge, hi_edge, n,
         sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER () AS total
  FROM hist
)
SELECT q,
       round(CASE WHEN bin = -1 THEN hi_edge
                  WHEN bin = {int(n_bins)} THEN lo_edge
                  ELSE lo_edge + ((q * total - (cum - n)) / n)
                       * (hi_edge - lo_edge) END, 6) AS est,
       bin AS est_bin
FROM (VALUES {q_rows}) AS t(q) CROSS JOIN cum
WHERE cum >= q * total AND cum - n < q * total
"""
