"""The composed 100 TB lifecycle, end-to-end on a small corpus:

    run_extract_job  (pages -> documents + lineage, resumable)
      -> run_curate_job  (documents -> curated corpus + fate metrics)
        -> compact_table  (defragment the curated table)
          -> write_bucketed  (pay the doc_id shuffle once)

Every stage is unit-tested elsewhere; this drives the handoffs — each
stage reads exactly what the previous one wrote, fates fire on real
extracted text, and the final bucketed table joins Exchange-free.
PLANS.md documents the composed lineage.
"""

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.jobs.compact import compact_table
from pdf_parser_spark.jobs.bucketize import write_bucketed
from pdf_parser_spark.jobs.curate import run_curate_job
from pdf_parser_spark.jobs.extract import run_extract_job


def _html(body: str) -> bytearray:
    return bytearray(f"<html><body><p>{body}</p></body></html>".encode())


def _body(i: int) -> str:
    """24 all-alpha words, every word carrying the doc code — so the
    word-5-shingle sets of two different docs are DISJOINT (near-dedup
    fires only where this fixture intends), all bigrams are distinct
    (repetition gate passes), and n_words/avg_word_len/alpha_ratio all
    clear the quality gate."""
    code = chr(97 + i % 25) + chr(97 + i // 25)
    return " ".join(f"word{code}{chr(97 + j)}" for j in range(24))


def _pages(spark):
    rows = []
    # 40 unique, healthy documents
    for i in range(40):
        rows.append((f"http://site{i % 7}.test/p{i}", _html(_body(i))))
    # url dups: same canonical url once tracking params are stripped
    for i in range(6):
        rows.append((f"http://site{i % 7}.test/p{i}?utm_source=feed",
                     _html(_body(i))))
    # exact dups: distinct canonical urls, identical extracted text
    for i in range(5):
        rows.append((f"http://mirror.test/copy{i}", _html(_body(i))))
    # near dups of doc 3: one appended word -> 20 of 21 shingles
    # shared (Jaccard ~0.95), deterministic LSH band collision
    for i in range(3):
        rows.append((f"http://near{i}.test/x",
                     _html(_body(3) + " extra" + chr(97 + i))))
    # quality fails: too-short bodies
    for i in range(4):
        rows.append((f"http://thin{i}.test/", _html("ok")))
    # extraction error: truncated PDF payload
    rows.append(("http://broken.test/doc.pdf",
                 bytearray(b"%PDF-1.4\n1 0 obj\n<< truncated")))
    return spark.createDataFrame(rows, "url string, html binary")


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lifecycle")
    pages_ref = str(root / "pages.parquet")
    out = str(root / "out")
    _pages(spark).write.parquet(pages_ref)

    stats = run_extract_job(spark, pages_ref, out, run_id="r1",
                            n_buckets=8, partitions=8)
    curate = run_curate_job(spark, os.path.join(out, "documents.parquet"),
                            out)
    return {"out": out, "extract": stats, "curate": curate}


def test_extract_stage(spark, lifecycle):
    assert lifecycle["extract"]["n_docs"] == 59
    docs = spark.read.parquet(
        os.path.join(lifecycle["out"], "documents.parquet"))
    assert docs.where(F.col("error").isNotNull()).count() == 1
    lin = spark.read.parquet(
        os.path.join(lifecycle["out"], "lineage.parquet"))
    assert lin.agg(F.sum("n_docs")).first()[0] == 59


def test_curate_stage_fates_fire(spark, lifecycle):
    """Every curation stage fires on REAL extracted text: the fate
    breakdown is exact — doc_id = md5(raw url), dedup keepers are the
    min doc_id, so counts (not membership) are the stable contract."""
    fates = lifecycle["curate"]["fates"]
    assert fates["error"] == 1
    assert sum(v for k, v in fates.items()
               if k.startswith("quality:")) == 4
    assert fates["url_dup"] == 6      # utm variants of p0..p5
    assert fates["exact_dup"] == 5    # mirror copies
    assert fates["near_dup"] == 3     # the appended-word variants of
    #                                   doc 3 cluster with it
    assert fates["kept"] == 40
    curated = spark.read.parquet(
        os.path.join(lifecycle["out"], "curated.parquet"))
    assert curated.count() == 40
    assert "fate" not in curated.columns  # audit column dropped
    metrics = spark.read.parquet(
        os.path.join(lifecycle["out"], "curation_metrics.parquet"))
    assert {r.fate: r.n_docs for r in metrics.collect()} == fates


def test_compact_then_bucketize(spark, lifecycle):
    curated_ref = os.path.join(lifecycle["out"], "curated.parquet")
    before = {r.doc_id for r in
              spark.read.parquet(curated_ref).select("doc_id").collect()}

    stats = compact_table(spark, curated_ref, n_files=2)
    assert stats["files_after"] == 2 <= stats["files_before"]
    after = spark.read.parquet(curated_ref)
    assert {r.doc_id for r in after.select("doc_id").collect()} == before

    spark.sql("DROP TABLE IF EXISTS lifecycle_docs")
    write_bucketed(after, "lifecycle_docs", key="doc_id", buckets=4)
    t = spark.table("lifecycle_docs")
    assert {r.doc_id for r in t.select("doc_id").collect()} == before
    # the layout the whole dance paid for: a doc_id join runs with NO
    # Exchange on the bucketed side (merge hint pins SMJ so a
    # broadcast can't mask the check)
    joined = t.hint("merge").join(
        t.select("doc_id").hint("merge"), "doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Bucketed: true" in plan, plan
    assert "hashpartitioning(doc_id" not in plan, plan
    spark.sql("DROP TABLE lifecycle_docs")


def test_shard_export_closes_the_lifecycle(spark, lifecycle):
    # the final stage: curated corpus -> training shards. Token totals
    # must survive the whole extract -> curate -> shard dance.
    from pyspark.sql import functions as F

    from pdf_parser_spark.jobs.shards import write_train_shards

    curated_ref = os.path.join(lifecycle["out"], "curated.parquet")
    out = os.path.join(lifecycle["out"], "shards")
    totals = write_train_shards(
        spark, curated_ref, out, block=64, n_shards=2, n_buckets=4,
    )
    assert totals["n_shards"] == 2
    n_tok = (
        spark.read.parquet(curated_ref)
        .selectExpr(
            "sum(CASE WHEN length(trim(text)) > 0 "
            "THEN size(split(trim(text), '\\\\s+')) ELSE 0 END) AS t"
        )
        .first()["t"]
    )
    assert totals["n_tokens"] == n_tok
    segs = spark.read.parquet(os.path.join(out, "segments"))
    # every non-final block holds exactly `block` tokens
    fills = segs.groupBy("block_id").agg(F.sum("seg_len").alias("f"))
    mx = fills.agg(F.max("block_id")).first()[0]
    bad = fills.where(
        (F.col("block_id") != mx) & (F.col("f") != 64)
    ).count()
    assert bad == 0
