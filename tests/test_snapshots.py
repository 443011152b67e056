"""Crawl snapshot diff (operators/snapshots.py): status semantics,
fp_col seam, and DuckDB twin parity."""

import duckdb

from pdf_parser_spark.operators import snapshots as sn


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "same"), ("b", "v1"), ("c", "gone")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("a", "same"), ("b", "v2"), ("d", "fresh")],
        "url string, text string",
    )
    got = {r.url: r.status for r in sn.snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged", "b": "changed", "c": "removed", "d": "added",
    }
    stats = {
        r.status: r.n_urls
        for r in sn.snapshot_diff_stats(old, new).collect()
    }
    assert stats == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_fp_col_seam(spark):
    # canonical-fingerprint diff: whitespace-only rewrite is NOT a
    # change when the caller supplies the canonical hash column
    from pyspark.sql import functions as F

    old = spark.createDataFrame([("a", "x y")], "url string, text string")
    new = spark.createDataFrame([("a", "x  y")], "url string, text string")
    raw = {r.url: r.status for r in sn.snapshot_diff(old, new).collect()}
    assert raw == {"a": "changed"}
    canon = F.md5(F.regexp_replace(F.col("text"), r"\s+", " "))
    got = {
        r.url: r.status
        for r in sn.snapshot_diff(
            old.withColumn("fp", canon), new.withColumn("fp", canon),
            fp_col="fp",
        ).collect()
    }
    assert got == {"a": "unchanged"}


def test_snapshot_diff_twin(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from pyspark.sql import functions as F

    old = docs.where(F.col("doc_id") % 3 != 0).selectExpr(
        "CAST(doc_id AS STRING) AS url", "text")
    new = docs.where(F.col("doc_id") % 4 != 1).selectExpr(
        "CAST(doc_id AS STRING) AS url",
        "CASE WHEN doc_id % 5 = 0 THEN text || 'x' ELSE text END AS text",
    )
    got = sorted(tuple(r) for r in sn.snapshot_diff(old, new).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    sql = sn.snapshot_diff_sql(
        "SELECT CAST(doc_id AS VARCHAR) AS url, text FROM documents "
        "WHERE doc_id % 3 != 0",
        "SELECT CAST(doc_id AS VARCHAR) AS url, "
        "CASE WHEN doc_id % 5 = 0 THEN text || 'x' ELSE text END AS text "
        "FROM documents WHERE doc_id % 4 != 1",
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
    statuses = {r[1] for r in got}
    assert statuses == {"added", "removed", "changed", "unchanged"}
