"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003): the SAMPLED counterpart to the exact positional-span
tier (`operators/spans.py`).

`dup_spans` hashes EVERY k-gram position — exact, but one shuffled row
per word of the corpus. Winnowing keeps, from each window of `w`
consecutive k-gram hashes, only the minimum (rightmost on ties — the
paper's "robust winnowing", so equal-hash runs re-select the SAME
position and shared substrings fingerprint identically in both
documents). The guarantees (paper §3):

- any shared substring of at least w + k - 1 words is detected
  (its window of hashes selects the same fingerprint in both docs);
- density is 2/(w+1) — the shuffled volume drops ~(w+1)/2-fold
  against the positional tier, the knob a 100 TB corpus needs when
  the exact pass is too expensive.

The reference app (`/root/reference`, a per-request PDF/HTML parser)
has no corpus operators; this covers the overlap-detection step of a
training-data pipeline at a tunable cost point between minhash (set
similarity, no positions) and dup_spans (exact positions, full cost).

Scale notes (100 TB):
- fingerprint selection is MAP-ONLY: one native expression per doc
  (split → gram hashes → per-window fold), no UDF, nothing shuffles
  until the fingerprints themselves — ~2·n_words/(w+1) rows of
  (doc_id, pos, fp) bigints per doc.
- `winnow_pairs` joins the fingerprint relation to itself on `fp`.
  Boilerplate grams make hot keys; the count-first cap drops any
  fingerprint shared by more than `max_df` docs BEFORE the self-join
  (the LSH-bucket defusal from `operators/dedup.py`), so the join's
  per-key fan-out is bounded by construction.

Hashes reuse the dedup tier's engine-portable md5→int idiom, so both
operators have exact DuckDB twins in `__spark_entry__`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MINHASH_PRIME, shingle_hashes, shingle_hashes_sql

#: gram size (words) and window size (grams): detects shared runs of
#: >= WINNOW_W + WINNOW_K - 1 = 8 words, matching SPAN_NGRAM's scale.
WINNOW_K = 5
WINNOW_W = 4


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(id, pos, fp): winnowed fingerprint selection, map-only.

    `pos` is the 1-based word index where the selected k-gram starts;
    `fp` its 60-bit hash. Each window of `w` consecutive gram hashes
    contributes its minimum, rightmost position on ties; a (pos, fp)
    selected by several windows is recorded once. Documents with
    fewer than k words yield no rows; documents with fewer than w
    grams winnow their single truncated window (so every doc with at
    least one gram is fingerprinted).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    # STAGED: the gram-hash array is computed once per row into a
    # column, and every downstream expression references the
    # attribute. Inlining it instead puts the md5 shingle-hash chain
    # INSIDE the per-window fold, where codegen subexpression
    # elimination does not reach across nested lambdas — the hashes
    # recompute per window, turning O(n·w) into O(n²·hash)
    # (measured 200 s → 4 s at sf0.1).
    staged = df.select(
        F.col(id_col),
        shingle_hashes(F.col(text_col), shingle_n=k).alias("_hs"),
    ).select(
        F.col(id_col),
        # (h, p) pairs via the two-arg transform (arg 2 = ARRAY INDEX)
        F.transform(
            F.col("_hs"),
            lambda x, i: F.struct(x.alias("h"), i.alias("p")),
        ).alias("_hp"),
    )
    hp = F.col("_hp")
    n = F.size(hp)
    starts = F.when(
        n <= 0, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(0), F.greatest(n - w, F.lit(0))))
    init = F.struct(
        F.lit(MINHASH_PRIME).cast("long").alias("h"),
        F.lit(-1).alias("p"),
    )
    # rightmost min: the fold walks the slice left->right and <= lets
    # later equal hashes replace earlier ones.
    sel = F.transform(
        starts,
        lambda j: F.aggregate(
            F.slice(hp, j + 1, w),
            init,
            lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc),
        ),
    )
    return (
        staged.select(F.col(id_col), F.explode(F.array_distinct(sel)).alias("s"))
        .select(
            id_col,
            (F.col("s.p") + 1).alias("pos"),
            F.col("s.h").alias("fp"),
        )
    )


def winnow_fingerprints_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> str:
    """DuckDB twin: the same selection as plain SQL — per-doc gram
    rows (lockstep unnest), window starts from the gram count, min
    per window, rightmost position of that min, distinct."""
    hs = shingle_hashes_sql(text_col, shingle_n=k)
    return f"""
WITH grams AS MATERIALIZED (
  SELECT {id_col},
         unnest(generate_series(0, len(hs) - 1)) AS p,
         unnest(hs) AS h
  FROM (SELECT {id_col}, {hs} AS hs FROM {table})
  WHERE len(hs) > 0
),
starts AS (
  SELECT {id_col},
         unnest(generate_series(0, greatest(count(*) - {w}, 0))) AS j
  FROM grams GROUP BY {id_col}
),
win AS (
  SELECT s.{id_col}, s.j, min(g.h) AS min_h
  FROM starts s
  JOIN grams g ON g.{id_col} = s.{id_col}
             AND g.p BETWEEN s.j AND s.j + {w - 1}
  GROUP BY s.{id_col}, s.j
),
sel AS (
  SELECT w.{id_col}, w.j, w.min_h,
         max(g.p) AS sel_p
  FROM win w
  JOIN grams g ON g.{id_col} = w.{id_col} AND g.h = w.min_h
             AND g.p BETWEEN w.j AND w.j + {w - 1}
  GROUP BY w.{id_col}, w.j, w.min_h
)
SELECT DISTINCT {id_col}, sel_p + 1 AS pos, min_h AS fp FROM sel
"""


def winnow_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """(id_a, id_b, shared): document pairs sharing at least
    `min_shared` distinct winnowed fingerprints, id_a < id_b.

    `max_df` is the count-first boilerplate defusal: a fingerprint
    present in more than `max_df` documents is dropped BEFORE the
    self-join (hot navigation/footer grams would otherwise fan out
    quadratically per key). The drop is deterministic, mirrored by
    the oracle twin, and biased only AGAINST reporting boilerplate
    overlap — the pairs that matter (bounded-copy plagiarism, mirror
    pages) sit far under the cap.
    """
    docfp = fps.select(id_col, "fp").distinct()
    rare = (
        docfp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    kept = docfp.join(rare, "fp")
    a = kept.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def winnow_pairs_sql(
    fp_cte: str,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int = 64,
) -> str:
    """DuckDB twin over a fingerprint CTE body (`fp_cte` must select
    ({id_col}, pos, fp))."""
    return f"""
WITH fps AS MATERIALIZED ({fp_cte}),
docfp AS (SELECT DISTINCT {id_col}, fp FROM fps),
rare AS (
  SELECT fp FROM docfp GROUP BY fp HAVING count(*) <= {max_df}
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS shared
FROM docfp a
JOIN rare r ON a.fp = r.fp
JOIN docfp b ON b.fp = a.fp AND a.{id_col} < b.{id_col}
GROUP BY a.{id_col}, b.{id_col}
HAVING count(*) >= {min_shared}
"""
