"""Positional n-gram operators: cross-document duplicated-span
detection and benchmark decontamination.

The reference app (`/root/reference`, a per-request PDF/HTML parser)
has no corpus-level text operators; these cover two steps every
large-scale training-data pipeline runs between extraction and
training:

- **Duplicated spans** (Lee et al., "Deduplicating Training Data Makes
  Language Models Better", ACL 2022): find maximal word spans whose
  every n-gram occurs more than once in the corpus. Lee et al. build a
  single-node suffix array; the Spark-native shape is positional
  n-gram hashing — explode (doc, position, ngram-hash), count hash
  occurrences globally, keep duplicated positions, and merge
  overlapping/adjacent hits per document with a gaps-and-islands
  window. Fixed-length spans sorted by start have monotone ends, so a
  `lag` comparison is an exact merge — no running-max needed.

- **Decontamination** (GPT-3 appendix C / PaLM-style): flag corpus
  documents sharing any n-gram with a benchmark/eval set so they can
  be dropped before training. The benchmark side is always tiny
  relative to the corpus → its distinct n-gram hashes are broadcast,
  the corpus side is a map-side broadcast semi/inner join, and the
  only shuffle carries the (doc_id, hash) HIT rows — at crawl scale a
  vanishing fraction of the corpus.

Scale notes (100 TB):
- `dup_spans` is the honest heavyweight: one row per word position
  crosses two bigint-keyed shuffles (the global occurrence count and
  the join-back). Texts themselves never move — only (doc_id, pos,
  hash8) triples — and the per-doc merge window partitions by doc_id,
  which is unskewed by construction. Hot boilerplate n-grams make the
  count/join keys skewed; AQE skew-join splits those (the join is a
  plain equi-join on a bigint). This is the standard distributed
  relaxation of the suffix-array pass.
- `contamination` / `decontaminate` shuffle only hits; the benchmark
  n-gram set rides a broadcast. With a 10^6-ngram benchmark the
  broadcast is ~8 MB of bigints — well under executor budgets.

All hashes reuse the dedup tier's engine-portable md5→int idiom
(`operators/dedup.py:shingle_hashes`), so every operator here has an
exact DuckDB twin in `__spark_entry__`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_hashes, shingle_hashes_sql

#: Lee et al. use 50 BPE tokens; at word granularity published
#: pipelines (RefinedWeb, Dolma) use shorter windows. Default 8 words.
SPAN_NGRAM = 8


def _positional_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, pos, h): one row per word position that starts an n-gram;
    `pos` is the 1-based word index, `h` the n-gram's 60-bit hash."""
    return df.select(
        F.col(id_col),
        F.posexplode(shingle_hashes(F.col(text_col), shingle_n=n)).alias(
            "pos0", "h"
        ),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "h")


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated word spans per document →
    (id, span_start, span_end, n_grams), positions 1-based inclusive.

    A position is *duplicated* when its word n-gram occurs >=
    `min_count` times corpus-wide (including repeats inside the same
    document — Lee et al.'s definition). Overlapping and adjacent
    duplicated n-grams merge into one span, so `span_end - span_start
    + 1 >= n` and spans within a document never overlap.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    pos = _positional_hashes(df, text_col, id_col, n)
    counts = pos.groupBy("h").agg(F.count("*").alias("_hc"))
    dup_pos = (
        pos.join(counts.where(F.col("_hc") >= min_count), "h", "left_semi")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    # gap iff this n-gram starts past the previous span's end+1; with
    # fixed-length spans in start order, lag(pos)+n-1 IS the running
    # max end, so lag alone is exact.
    flagged = dup_pos.withColumn(
        "_new",
        F.when(
            F.col("pos") > F.coalesce(F.lag("pos").over(w) + n, F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .drop("_island")
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    min_count: int = 2,
) -> DataFrame:
    """Per-document cross-corpus duplication metrics →
    (id, n_words, dup_words, dup_frac): the corpus-level sibling of the
    within-doc Gopher repetition ratio (`functions/textstats.py`).
    Every input document gets a row (zero spans → 0 / 0.0)."""
    spans = dup_spans(df, text_col, id_col, n, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("_dw")
    )
    n_words = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    return (
        df.select(id_col, n_words.alias("n_words"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_words",
            F.coalesce(F.col("_dw"), F.lit(0)).alias("dup_words"),
            F.round(
                F.coalesce(F.col("_dw"), F.lit(0))
                / F.greatest(F.col("n_words"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def dup_spans_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`dup_spans` (same hashes, same windows).

    posexplode twin: DuckDB unnests multiple same-length lists in one
    SELECT in lockstep, so `unnest(generate_series(1, len(hs)))`
    provides the 1-based position column.
    """
    hs = shingle_hashes_sql(text_col, n)
    return f"""
WITH pos AS (
  SELECT {id_col},
         unnest(generate_series(1, len(hs))) AS pos,
         unnest(hs) AS h
  FROM (SELECT {id_col}, {hs} AS hs FROM {table})
),
dup_pos AS (
  SELECT * FROM pos
  WHERE h IN (SELECT h FROM pos GROUP BY h HAVING count(*) >= {min_count})
),
flagged AS (
  SELECT {id_col}, pos,
         CASE WHEN pos > coalesce(
             lag(pos) OVER (PARTITION BY {id_col} ORDER BY pos) + {n}, -1)
           THEN 1 ELSE 0 END AS new_island
  FROM dup_pos
),
islands AS (
  SELECT {id_col}, pos,
         SUM(new_island) OVER (
           PARTITION BY {id_col} ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT {id_col},
       MIN(pos) AS span_start,
       MAX(pos) + {n - 1} AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM islands GROUP BY {id_col}, island
"""


def dup_span_stats_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    min_count: int = 2,
) -> str:
    spans = dup_spans_sql(table, text_col, id_col, n, min_count)
    return f"""
WITH spans AS ({spans}),
per_doc AS (
  SELECT {id_col}, SUM(span_end - span_start + 1) AS dw
  FROM spans GROUP BY {id_col}
)
SELECT t.{id_col},
       CAST(CASE WHEN trim(t.{text_col}) = '' THEN 0
            ELSE len(string_split_regex(trim(t.{text_col}), '\\s+'))
            END AS INT) AS n_words,
       CAST(coalesce(p.dw, 0) AS BIGINT) AS dup_words,
       round(coalesce(p.dw, 0) / greatest(
         CASE WHEN trim(t.{text_col}) = '' THEN 0
              ELSE len(string_split_regex(trim(t.{text_col}), '\\s+')) END,
         1), 6) AS dup_frac
FROM {table} t LEFT JOIN per_doc p ON t.{id_col} = p.{id_col}
"""


def strip_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    min_count: int = 2,
) -> DataFrame:
    """The step Lee et al. actually ship: cut every duplicated span
    out of the text → (id, text, n_words_kept). Whitespace is
    normalized to single spaces (positions are defined by the \\s+
    tokenization, so the rebuilt text is the space-join of the kept
    words); documents with no duplicated spans pass through with the
    same normalization, so the output column is uniformly normalized.

    Plan shape: spans per doc collapse to ONE small array via
    collect_list (bounded by spans-per-doc, not corpus size), join
    back on id, and the word filter is a native nested higher-order
    expression (filter + exists) — no Python, texts shuffle once as
    the span join's probe side is the original scan.
    """
    spans = dup_spans(df, text_col, id_col, n, min_count)
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    words = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    joined = df.join(span_arr, id_col, "left").withColumn(
        "_spans",
        F.coalesce(
            F.col("_spans"),
            F.array().cast("array<struct<s:int,e:int>>"),
        ),
    )
    kept = F.filter(
        words,
        lambda w, i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
        ),
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", kept).alias(text_col),
        F.size(kept).alias("n_words_kept"),
    )


def strip_dup_spans_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`strip_dup_spans`, formulated relationally
    (positions minus span-covered positions, space-joined in order) —
    same semantics as the Spark side's array filter, different
    decomposition, so the oracle validates the meaning not the plan."""
    spans = dup_spans_sql(table, text_col, id_col, n, min_count)
    words = (
        f"CASE WHEN trim({text_col}) = '' THEN [] "
        f"ELSE string_split_regex(trim({text_col}), '\\s+') END"
    )
    return f"""
WITH spans AS ({spans}),
covered AS (
  SELECT DISTINCT {id_col},
         unnest(generate_series(span_start, span_end)) AS pos
  FROM spans
),
allpos AS (
  SELECT {id_col},
         unnest(generate_series(1, len(ws))) AS pos,
         unnest(ws) AS w
  FROM (SELECT {id_col}, {words} AS ws FROM {table})
),
kept AS (
  SELECT a.* FROM allpos a
  LEFT JOIN covered c ON a.{id_col} = c.{id_col} AND a.pos = c.pos
  WHERE c.pos IS NULL
)
SELECT t.{id_col},
       coalesce(k.text, '') AS {text_col},
       CAST(coalesce(k.nw, 0) AS INT) AS n_words_kept
FROM {table} t
LEFT JOIN (
  SELECT {id_col}, string_agg(w, ' ' ORDER BY pos) AS text,
         count(*) AS nw
  FROM kept GROUP BY {id_col}
) k ON t.{id_col} = k.{id_col}
"""


# ------------------------------------------------------ decontamination


def benchmark_ngram_hashes(
    bench: DataFrame, text_col: str = "text", n: int = SPAN_NGRAM
) -> DataFrame:
    """Distinct n-gram hashes of a benchmark/eval set → one `h` column.
    Small by assumption (eval sets are MBs); materialize once and
    broadcast into every contamination check."""
    return (
        bench.select(
            F.explode(shingle_hashes(F.col(text_col), shingle_n=n)).alias("h")
        )
        .distinct()
    )


def contamination(
    df: DataFrame,
    bench_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
) -> DataFrame:
    """(id, n_hits): per document, how many DISTINCT benchmark n-grams
    it contains; only contaminated documents (n_hits >= 1) appear.

    Plan shape: corpus n-grams explode map-side, the benchmark set
    rides a broadcast hash join, and the groupBy shuffles ONLY the hit
    rows — clean documents never leave their scan task.
    """
    pos = df.select(
        F.col(id_col),
        F.explode(shingle_hashes(F.col(text_col), shingle_n=n)).alias("h"),
    )
    hits = pos.join(F.broadcast(bench_hashes.select("h")), "h")
    return hits.groupBy(id_col).agg(
        F.countDistinct("h").alias("n_hits")
    )


def decontaminate(
    df: DataFrame,
    bench_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
) -> DataFrame:
    """Corpus minus contaminated documents: the step a pipeline ships.
    One broadcast join + one id-only anti-join; document payloads are
    scanned once and never shuffled."""
    dirty = contamination(df, bench_hashes, text_col, id_col, n).select(
        id_col
    )
    return df.join(dirty, id_col, "left_anti")


def contamination_sql(
    table: str,
    bench_predicate: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
) -> str:
    """DuckDB twin of :func:`contamination` where the benchmark set is
    `SELECT * FROM {table} WHERE {bench_predicate}` (tests derive the
    benchmark from the corpus itself via a hash_sample predicate)."""
    hs = shingle_hashes_sql(text_col, n)
    return f"""
WITH bench_h AS (
  SELECT DISTINCT unnest(hs) AS h
  FROM (SELECT {hs} AS hs FROM {table} WHERE {bench_predicate})
),
pos AS (
  SELECT {id_col}, unnest(hs) AS h
  FROM (SELECT {id_col}, {hs} AS hs FROM {table})
)
SELECT {id_col}, CAST(count(DISTINCT pos.h) AS BIGINT) AS n_hits
FROM pos JOIN bench_h ON pos.h = bench_h.h
GROUP BY {id_col}
"""


def decontaminate_sql(
    table: str,
    bench_predicate: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = SPAN_NGRAM,
    columns: str = "*",
) -> str:
    inner = contamination_sql(table, bench_predicate, text_col, id_col, n)
    return (
        f"SELECT {columns} FROM {table} WHERE {id_col} NOT IN "
        f"(SELECT {id_col} FROM ({inner}))"
    )
