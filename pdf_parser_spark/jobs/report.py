# -*- coding: utf-8 -*-
"""Corpus telemetry report: the per-language / per-source summary a
curation run ships with its output (what Dolma publishes as "corpus
statistics" tables and CCNet logs per shard — doc counts, token mass,
quality, duplication rate at every rollup level).

One `cube(lang, source)` aggregation produces all four rollup levels
(cell, per-lang, per-source, grand total) in a single pass — Spark
expands each input row once per grouping set (4x for two dims) but the
expanded rows are NARROW (two dim strings + four numeric features + a
16-byte fingerprint); the texts themselves never enter the shuffle.
Partial (map-side) aggregation applies to everything except the exact
distinct-fingerprint count, which is the one genuinely expensive
statistic: at 100 TB flip ``exact_distinct=False`` to use
`approx_count_distinct` (HyperLogLog, fully map-combinable) — the
exact variant exists because it is the cross-engine-checkable one
(the DuckDB twin in :func:`corpus_report_sql` must hash-match).

Per-doc features reuse the pinned engine-portable definitions from
`functions/textstats.py` (ws_token_count, quality_score,
md5_fingerprint), so the report's numbers are consistent with the
`token_counts` / `quality_scores` / `fingerprints` queries by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdf_parser_spark.functions import textstats as ts


def corpus_report(
    docs: DataFrame,
    dims: tuple = ("lang", "source"),
    text_col: str = "text",
    exact_distinct: bool = True,
) -> DataFrame:
    """All-rollup corpus summary over ``dims``: doc/char/token mass,
    mean + exact-median tokens, mean quality score, distinct-text
    count and the implied duplicate rate.  ``total_<dim>`` flags (from
    `grouping()`) disambiguate a rollup NULL from a genuine NULL dim
    value."""
    c = F.col(text_col)
    per_doc = docs.select(
        *dims,
        F.length(c).alias("_chars"),
        ts.ws_token_count(c).alias("_tokens"),
        ts.quality_score(c).alias("_q"),
        ts.md5_fingerprint(c).alias("_fp"),
    )
    uniq = (
        F.count_distinct(F.col("_fp"))
        if exact_distinct
        else F.approx_count_distinct(F.col("_fp"))
    )
    n = F.count(F.lit(1))
    return (
        per_doc.cube(*dims)
        .agg(
            *[F.grouping(d).cast("int").alias(f"total_{d}") for d in dims],
            n.alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
            F.sum("_tokens").alias("total_tokens"),
            F.round(F.avg("_tokens"), 6).alias("avg_tokens"),
            F.round(F.percentile(F.col("_tokens"), F.lit(0.5)), 6).alias(
                "p50_tokens"
            ),
            F.round(F.avg("_q"), 6).alias("avg_quality"),
            uniq.alias("uniq_texts"),
            F.round(
                F.lit(1.0) - uniq.cast("double") / n.cast("double"), 6
            ).alias("dup_rate"),
        )
    )


def corpus_report_sql(
    table: str,
    dims: tuple = ("lang", "source"),
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`corpus_report` (exact-distinct variant):
    same CUBE, same per-doc feature definitions from textstats' SQL
    twins, same 6-dp rounding."""
    dim_list = ", ".join(dims)
    flags = ", ".join(
        f"CAST(GROUPING({d}) AS INTEGER) AS total_{d}" for d in dims
    )
    return f"""
SELECT {dim_list}, {flags},
       count(*) AS n_docs,
       CAST(sum(_chars) AS BIGINT) AS total_chars,
       CAST(sum(_tokens) AS BIGINT) AS total_tokens,
       round(avg(_tokens), 6) AS avg_tokens,
       round(quantile_cont(_tokens, 0.5), 6) AS p50_tokens,
       round(avg(_q), 6) AS avg_quality,
       count(DISTINCT _fp) AS uniq_texts,
       round(1.0 - CAST(count(DISTINCT _fp) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM (
    SELECT {dim_list},
           length({text_col}) AS _chars,
           {ts.ws_token_count_sql(text_col)} AS _tokens,
           {ts.quality_score_sql(text_col)} AS _q,
           {ts.md5_fingerprint_sql(text_col)} AS _fp
    FROM {table}
)
GROUP BY CUBE ({dim_list})
"""
