"""Bloom-filter dedup against a history corpus (the Dolma/BFF idiom:
Soldaini et al. 2024, arXiv:2402.00159, "Bloom Filter File" deduper).

Incremental curation (jobs/curate.py) marks a new document as
`exact_dup_hist` by anti-joining the history's md5 table — exact, no
false positives, but the join side GROWS with the corpus: 16 bytes x
10^12 rows = 16 TB of history hashes shuffled per increment.  The
Bloom relaxation caps that state at a FIXED budget chosen up front:
a document contributes k bit positions in [0, m); the filter is the
SET of positions ever seen; a candidate is "maybe seen" iff ALL k of
its positions are set.  No false negatives ever; false positives at
the classical rate (~(bits_set/m)^k), tuned by m — the operator that
lets a 10^12-row deployment dedup increments against ALL history in
a few GB of state.

Relational relaxation (no native bitmap): the filter is a DataFrame
of DISTINCT set bit positions (<= m single-bigint rows — bounded by
the BUDGET, not the corpus; at the default m = 2^32 that is <= 34 GB
worst-case but ~m*fill_target in practice, and AQE broadcasts it
while small).  Membership is a left join on `pos` + a per-doc
bool_and — only (doc_id, pos) bigint pairs ever shuffle; texts never
move.  Positions are md5 arithmetic over the text (k salted draws),
so the whole construction is a pure function of content — identical
in the DuckDB twins and at any cluster size.

Scale design (100 TB):
- build: one map pass over history (k md5s per doc) + ONE distinct
  on bigint positions (partial-combine absorbs the duplicates that
  make Bloom filters small). Persist the bits table once per epoch
  (jobs/dedup_index.py idiom) and reuse across increments.
- probe: map-side position expansion, one join keyed on `pos`
  (broadcast while the filter is small, shuffle of narrow pairs
  otherwise), one partial-combine bool_and groupBy. Nothing scales
  with history size except the bounded bits table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_draw, hash_draw_sql

#: default filter width in bits. Sized for tests/demos; a production
#: epoch picks m ~ 20x expected distinct docs for ~0.1% FP at k=7.
DEFAULT_M = 1 << 22
#: hash functions per document (k). 7 minimizes FP near fill ~ 1/2^7.
DEFAULT_K = 7


def _positions(col: Column, m: int, k: int, salt: str) -> Column:
    """Array of the k salted bit positions of a text value — pure md5
    arithmetic, engine-portable. Within-doc position collisions are
    legal Bloom behavior; array_distinct at the use sites keeps the
    all-bits-set test honest."""
    return F.array(
        *[hash_draw(col, f"{salt}{i}#") % m for i in range(k)]
    )


def _positions_sql(col: str, m: int, k: int, salt: str) -> str:
    parts = ", ".join(
        f"{hash_draw_sql(col, f'{salt}{i}#')} % {m}" for i in range(k)
    )
    return f"[{parts}]"


def build_bloom_bits(
    history: DataFrame,
    text_col: str = "text",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    salt: str = "bloom",
) -> DataFrame:
    """The filter: DISTINCT set bit positions of every history text
    → (pos). <= m rows regardless of history size."""
    return (
        history.select(
            F.explode(
                _positions(F.col(text_col), m, k, salt)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_maybe_dup(
    df: DataFrame,
    bits: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    salt: str = "bloom",
) -> DataFrame:
    """Probe every candidate against the filter → (id, maybe_dup):
    maybe_dup iff ALL k positions are set. A text that IS in history
    is always flagged (no false negatives); a fresh text is flagged
    only at the filter's FP rate."""
    probe = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_positions(F.col(text_col), m, k, salt))
        ).alias("pos"),
    )
    return (
        probe.join(bits.withColumn("hit", F.lit(True)), "pos", "left")
        .groupBy(id_col)
        .agg(
            F.min(F.coalesce(F.col("hit"), F.lit(False))).alias(
                "maybe_dup"
            )
        )
    )


def bloom_maybe_dup_against(
    df: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    salt: str = "bloom",
) -> DataFrame:
    """Build-and-probe in one call (the single-increment shape; an
    epoch deployment builds the bits once and reuses them)."""
    return bloom_maybe_dup(
        df, build_bloom_bits(history, text_col, m, k, salt),
        text_col, id_col, m, k, salt,
    )


def bloom_maybe_dup_sql(
    table: str,
    history_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    salt: str = "bloom",
) -> str:
    """DuckDB twin of :func:`bloom_maybe_dup_against`."""
    hist_pos = _positions_sql(text_col, m, k, salt)
    cand_pos = _positions_sql(text_col, m, k, salt)
    return f"""
WITH bits AS (
  SELECT DISTINCT unnest({hist_pos}) AS pos FROM {history_table}
),
probe AS (
  SELECT {id_col}, unnest(list_distinct({cand_pos})) AS pos
  FROM {table}
)
SELECT p.{id_col},
       bool_and(b.pos IS NOT NULL) AS maybe_dup
FROM probe p LEFT JOIN bits b USING (pos)
GROUP BY p.{id_col}
"""
