"""Streaming extraction: same results as batch, exactly-once resume
via checkpoint (file source), incremental pickup of new files."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    from pdf_parser_spark.datagen.pages import write_pages

    d = str(tmp_path_factory.mktemp("stream_pages"))
    write_pages(spark, d, n=48, seed=7, include_fixtures=False)
    return os.path.join(d, "pages.parquet")


def test_stream_matches_batch(spark, pages_dir, tmp_path):
    from pdf_parser_spark.jobs.extract import extract_documents
    from pdf_parser_spark.streaming.extract_stream import run_extract_stream

    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    run_extract_stream(spark, pages_dir, out, ckpt, available_now=True)
    got = {r.url: r for r in spark.read.parquet(out).collect()}

    batch = {
        r.url: r
        for r in extract_documents(spark.read.parquet(pages_dir)).collect()
    }
    assert set(got) == set(batch) and len(got) == 48
    for url in got:
        assert got[url].text == batch[url].text, url
        assert got[url].num_chunks == batch[url].num_chunks, url

    # resume: re-running with the same checkpoint ingests nothing new
    run_extract_stream(spark, pages_dir, out, ckpt, available_now=True)
    assert spark.read.parquet(out).count() == 48


def test_stream_picks_up_new_files(spark, pages_dir, tmp_path):
    from pdf_parser_spark.datagen.pages import generate_pages, PAGES_SCHEMA
    from pdf_parser_spark.streaming.extract_stream import run_extract_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    first = generate_pages(spark, 8, seed=11, include_fixtures=False)
    cols = [f.name for f in PAGES_SCHEMA.fields]
    first.select(*cols).write.mode("append").parquet(src)
    run_extract_stream(spark, src, out, ckpt, available_now=True)
    assert spark.read.parquet(out).count() == 8

    more = generate_pages(spark, 6, seed=12, include_fixtures=False)
    more.select(*cols).withColumn(
        "url", F.concat(F.lit("b/"), F.col("url"))
    ).write.mode("append").parquet(src)
    run_extract_stream(spark, src, out, ckpt, available_now=True)
    assert spark.read.parquet(out).count() == 14


def test_stateful_dedup_across_restarts(spark, tmp_path):
    """applyInPandasWithState: duplicates dropped within a batch AND
    across restarts (state store persists under the checkpoint)."""
    from pdf_parser_spark.datagen.pages import PAGES_SCHEMA, generate_pages
    from pdf_parser_spark.streaming.dedup_stream import run_dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    cols = [f.name for f in PAGES_SCHEMA.fields]
    batch = generate_pages(spark, 10, seed=21, include_fixtures=False)
    batch.select(*cols).write.mode("append").parquet(src)
    run_dedup_stream(spark, src, out, ckpt)
    first = spark.read.parquet(out).count()
    assert first == 10  # all distinct initially

    # re-append the SAME 10 pages under new urls (same text) + 4 new
    dup = batch.select(*cols).withColumn(
        "url", F.concat(F.lit("dup/"), F.col("url")))
    dup.write.mode("append").parquet(src)
    fresh = generate_pages(spark, 4, seed=22, include_fixtures=False)
    fresh.select(*cols).withColumn(
        "url", F.concat(F.lit("b/"), F.col("url"))
    ).write.mode("append").parquet(src)
    run_dedup_stream(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    # the 10 duplicates were suppressed by the persisted state
    assert len(rows) == 14
    assert len({r.fingerprint for r in rows}) == 14
