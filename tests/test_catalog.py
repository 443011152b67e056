"""Table I/O seam (sources/catalog.py): path refs -> parquet, catalog
identifiers -> managed tables via the DataFrameWriterV2 path — the
same code path an Iceberg catalog serves in production (north rule:
"Iceberg table of Common-Crawl-style pages", lineage "written as an
Iceberg lineage/metrics table"). The sandbox has no Iceberg jar, so
the catalog branch is exercised against Spark's built-in session
catalog: identical dispatch, identical writeTo/table calls."""

from pdf_parser_spark.sources import (
    append_table, is_path_ref, read_table, table_exists,
)


def test_is_path_ref_dispatch():
    assert is_path_ref("/root/testdata/sf0.001/documents.parquet")
    assert is_path_ref("out/documents.parquet")
    assert is_path_ref("lineage.parquet")
    assert is_path_ref("s3a://bucket/warehouse/pages")
    assert not is_path_ref("crawl.web.pages")
    assert not is_path_ref("documents_tbl")


def test_parquet_branch_roundtrip(spark, tmp_path):
    ref = str(tmp_path / "docs.parquet")
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    assert not table_exists(spark, ref)
    append_table(df, ref)
    assert table_exists(spark, ref)
    append_table(df, ref)  # append, not overwrite
    assert read_table(spark, ref).count() == 10


def test_catalog_branch_roundtrip(spark):
    # warehouse.dir is static — use the session default and DROP the
    # managed table afterwards (drop removes its warehouse files)
    import shutil

    ref = "lineage_seam_test"
    spark.sql(f"DROP TABLE IF EXISTS {ref}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{ref}", ignore_errors=True)  # stale location
    df = spark.range(3).withColumnRenamed("id", "url_bucket")
    assert not table_exists(spark, ref)
    append_table(df, ref)  # first write -> writeTo(...).create()
    assert table_exists(spark, ref)
    append_table(df, ref)  # second -> writeTo(...).append()
    assert read_table(spark, ref).count() == 6
    spark.sql(f"DROP TABLE {ref}")


def test_run_extract_job_takes_refs(spark, tmp_path):
    """run_extract_job accepts a path ref exactly as before (the seam
    is behaviour-preserving for the parquet branch)."""
    from pdf_parser_spark.datagen.pages import PAGES_SCHEMA, generate_pages
    from pdf_parser_spark.jobs.extract import run_extract_job

    pages = generate_pages(spark, 24, seed=7, include_fixtures=False)
    src = str(tmp_path / "pages.parquet")
    pages.select(*[f.name for f in PAGES_SCHEMA.fields]).write.parquet(src)
    out = str(tmp_path / "out")
    res = run_extract_job(spark, src, out, run_id="seam1", n_buckets=8)
    assert res["n_docs"] == 24


def test_run_extract_job_catalog_branch_with_resume(spark, tmp_path):
    """Full job against CATALOG refs: documents/lineage land as managed
    tables, and a second run resumes through the catalog lineage table
    (anti-join on completed buckets) writing zero new docs."""
    import shutil

    from pdf_parser_spark.datagen.pages import PAGES_SCHEMA, generate_pages
    from pdf_parser_spark.jobs.extract import run_extract_job
    from pdf_parser_spark.sources import read_table

    db = "crawl_seam_test"
    spark.sql(f"DROP TABLE IF EXISTS {db}.documents")
    spark.sql(f"DROP TABLE IF EXISTS {db}.lineage")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{db}.db", ignore_errors=True)  # stale location
    spark.sql(f"CREATE DATABASE {db}")

    pages = generate_pages(spark, 16, seed=11, include_fixtures=False)
    src = str(tmp_path / "pages.parquet")
    pages.select(*[f.name for f in PAGES_SCHEMA.fields]).write.parquet(src)

    res1 = run_extract_job(spark, src, db, run_id="cat1", n_buckets=4)
    assert res1["n_docs"] == 16 and res1["n_docs_run"] == 16
    assert read_table(spark, f"{db}.documents").count() == 16
    lin = read_table(spark, f"{db}.lineage")
    assert {r.status for r in lin.collect()} == {"ok"}

    # resume: all buckets complete -> nothing re-extracted, totals hold
    res2 = run_extract_job(spark, src, db, run_id="cat2", n_buckets=4)
    assert res2["n_docs_run"] == 0 and res2["n_docs"] == 16
    assert read_table(spark, f"{db}.documents").count() == 16

    spark.sql(f"DROP TABLE {db}.documents")
    spark.sql(f"DROP TABLE {db}.lineage")
    spark.sql(f"DROP DATABASE {db}")
