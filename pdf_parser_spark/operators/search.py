"""Trigram substring search over the documents table — the serving
tier for "which documents contain this string?" without a corpus
scan (the Google Code Search index shape, Cox 2012,
https://swtch.com/~rsc/regexp/regexp4.html; PostgreSQL's pg_trgm is
the same design).

A curation/debugging loop asks this constantly (find the documents
carrying a leaked benchmark sentence, a boilerplate string, a PII
pattern's context) and `contains()` over 100 TB per question is the
wrong cost model. The index is one relation:

- ``trigram_postings``: (gram, doc_id) — one row per DISTINCT
  3-char window per document, built in one explode + distinct pass
  and written clustered by gram (:func:`write_trigram_index`), so a
  query's ``gram IN (...)`` predicate prunes at parquet row-group
  min/max granularity (plan-asserted in tests/test_search.py, the
  jobs/term_index.py discipline).

Query = AND-intersection: a document can contain the needle only if
its postings hold EVERY trigram of the needle, so candidates are a
``gram IN`` scan + a count-match aggregate, then the exact
``contains`` verify runs on candidate texts only via one semi-join.
Candidates are a provable SUPERSET of true hits and the verify is
exact, so the result EQUALS the naive full-scan filter — which is
exactly the DuckDB twin (:func:`substring_search_sql`), making the
oracle a cross-algorithm check, not a mirrored one.

Matching is case-insensitive (pg_trgm convention): grams and the
verify both run over ``lower(text)``.

Scale design (100 TB):
- Build: one native explode (transform over sequence — no UDF) +
  per-doc `array_distinct` BEFORE the explode (within-doc dup grams
  never cross the wire) + one (gram, doc_id) distinct shuffle of
  narrow rows; texts never move. ~|text| rows per doc pre-distinct,
  bounded by 26^3+punct gram space corpus-wide per partition after
  map-side combine.
- Query: the gram IN scan reads only matching row groups; the
  count-match aggregate sees |needle|-3+1 postings per candidate at
  most; the verify semi-join touches candidate texts only. A needle
  shorter than 3 chars has no trigram and falls back to the honest
  full scan (documented, same result).
- Hot-gram skew: common trigrams ('th…', ' an') have huge postings;
  the AND-intersection aggregates per doc_id (partial-combine), so
  a hot gram adds narrow rows, not a hot reducer key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


TRIGRAMS_SQL = (
    "list_distinct(list_transform(generate_series(1,"
    " greatest(length(lower({col})) - 2, 0)),"
    " i -> substring(lower({col}), i, 3)))"
)


def trigram_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(gram, doc_id) — one row per distinct per-doc trigram.

    Staged O(n) build: the lowered per-char array is computed ONCE
    per row into a column, and grams assemble from three O(1) array
    lookups per position — `substr(t, i, 3)` inside the lambda would
    both re-lower the text per position and pay an O(i) UTF8 scan
    per call (the winnowing/CDC lesson, same staging fix)."""
    staged = df.select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), "").alias("_cs"),
    )
    cs = F.col("_cs")
    n = F.size(cs)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat(
            F.element_at(cs, i.cast("int")),
            F.element_at(cs, (i + 1).cast("int")),
            F.element_at(cs, (i + 2).cast("int")),
        ),
    )
    return staged.select(
        F.col(id_col),
        F.explode(
            F.when(n >= 3, F.array_distinct(grams)).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("gram"),
    ).select("gram", id_col)


def trigram_postings_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`trigram_postings`."""
    grams = TRIGRAMS_SQL.format(col=text_col)
    return (
        f"SELECT unnest({grams}) AS gram, {id_col}"
        f" FROM {table}"
    )


def write_trigram_index(
    df: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = None,
) -> None:
    """Build once: postings clustered by gram (repartition + in-file
    sort) so query-time ``gram IN`` pushes into the parquet scan and
    prunes row groups. The jobs/term_index.py layout discipline."""
    spark = df.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    (
        trigram_postings(df, text_col, id_col)
        .repartition(partitions, "gram")
        .sortWithinPartitions("gram")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _needle_grams(needle: str) -> list:
    t = needle.lower()
    return sorted({t[i : i + 3] for i in range(len(t) - 2)})


def _n_hits(t: Column, needle_l: str) -> Column:
    """Occurrence count: (len - len(without needle)) / len(needle) —
    exact integer arithmetic on both engines."""
    removed = F.length(t) - F.length(F.replace(t, F.lit(needle_l)))
    return (removed / F.lit(len(needle_l))).cast("long")


def substring_search(
    df: DataFrame,
    needle: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame = None,
) -> DataFrame:
    """(doc_id, n_hits) for documents whose lower(text) contains
    lower(needle); n_hits = occurrence count. ``postings`` is the
    materialized index relation (built inline from ``df`` when not
    given — correct, but re-derives the index per query)."""
    if not needle:
        raise ValueError("empty needle")
    needle_l = needle.lower()
    t = F.lower(F.col(text_col))
    verified = df.where(t.contains(needle_l)).select(
        F.col(id_col), _n_hits(t, needle_l).alias("n_hits")
    )
    grams = _needle_grams(needle)
    if not grams:  # < 3 chars: no trigram — honest full scan
        return verified
    if postings is None:
        postings = trigram_postings(df, text_col, id_col)
    cand = (
        postings.where(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("ng"))
        .where(F.col("ng") == len(grams))
        .select(id_col)
    )
    return df.join(cand, id_col, "left_semi").where(
        t.contains(needle_l)
    ).select(F.col(id_col), _n_hits(t, needle_l).alias("n_hits"))


def substring_search_sql(
    table: str, needle: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin: the naive full-scan filter the indexed plan is
    provably equal to (candidate superset + exact verify)."""
    needle_l = needle.lower().replace("'", "''")
    t = f"lower({text_col})"
    n_hits = (
        f"CAST((length({t}) - length(replace({t}, '{needle_l}', '')))"
        f" / {len(needle.lower())} AS BIGINT)"
    )
    return (
        f"SELECT {id_col}, {n_hits} AS n_hits FROM {table}"
        f" WHERE contains({t}, '{needle_l}')"
    )
