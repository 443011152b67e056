"""Corpus telemetry report (jobs/report.py): rollup math is exact,
grouping flags disambiguate totals, and the DuckDB twin is
byte-identical."""

import duckdb

from pdf_parser_spark.jobs.report import corpus_report, corpus_report_sql

ROWS = [
    # (doc_id, text, lang, source)
    (1, "alpha beta gamma", "en", "web"),
    (2, "alpha beta gamma", "en", "web"),        # exact dup of 1
    (3, "one two three four five", "en", "pdf"),
    (4, "uno dos", "es", "web"),
    (5, "uno dos tres cuatro", "es", "pdf"),
    (6, "", "es", "pdf"),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id bigint, text string, lang string, source string"
    )


def _key(r):
    return (r["total_lang"], r["total_source"], r["lang"] or "", r["source"] or "")


def test_rollup_math(spark):
    out = {_key(r): r for r in corpus_report(_df(spark)).collect()}
    assert len(out) == 4 + 2 + 2 + 1  # cells + per-lang + per-source + total
    total = out[(1, 1, "", "")]
    assert total["n_docs"] == 6
    assert total["total_tokens"] == 3 + 3 + 5 + 2 + 4 + 0
    assert total["uniq_texts"] == 5
    assert total["dup_rate"] == round(1 - 5 / 6, 6)
    en = out[(0, 1, "en", "")]
    assert en["n_docs"] == 3 and en["uniq_texts"] == 2
    assert en["p50_tokens"] == 3.0  # tokens 3,3,5 -> median 3
    cell = out[(0, 0, "es", "pdf")]
    assert cell["n_docs"] == 2 and cell["total_tokens"] == 4
    assert cell["p50_tokens"] == 2.0  # tokens 0,4 -> interpolated 2


def test_approx_variant_runs(spark):
    out = corpus_report(_df(spark), exact_distinct=False).collect()
    total = [r for r in out if r["total_lang"] == 1 and r["total_source"] == 1][0]
    assert total["n_docs"] == 6 and total["uniq_texts"] >= 4


def _canon(rows):
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_duckdb_twin_byte_identical(spark):
    spark_rows = _canon(corpus_report(_df(spark)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?, ?, ?)" for _ in ROWS)
        + ") AS t(doc_id, text, lang, source)",
        [v for row in ROWS for v in row],
    )
    oracle = _canon(con.execute(corpus_report_sql("documents")).fetchall())
    assert oracle == spark_rows
