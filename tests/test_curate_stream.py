"""Streaming incremental curation (streaming/curate_stream.py): each
micro-batch curated against the corpus accumulated by earlier batches;
only novel documents append."""

import os

from pyspark.sql import functions as F

from pdf_parser_spark.streaming.curate_stream import (
    curate_batch,
    run_curate_stream,
)


def _isent(seed: int, n: int = 20) -> str:
    code = chr(97 + seed % 25) + chr(97 + seed // 25)
    return " ".join(f"word{code}{chr(97 + j)}" for j in range(n))


def _rows(urls_texts):
    return [(u, t, None) for u, t in urls_texts]


SCHEMA = "url string, text string, error string"

BATCH_A = _rows(
    [(f"http://a{i}.test/p", _isent(i)) for i in range(5)]  # texts 0..4
)
#: 3 exact copies of batch A texts (new urls) + 2 novel docs
BATCH_B = _rows(
    [(f"http://b{i}.test/p", _isent(i)) for i in range(3)]
    + [(f"http://b{i}.test/p", _isent(i)) for i in (6, 7)]
)


def test_curate_batch_unit_grows_corpus_incrementally(spark, tmp_path):
    corpus = str(tmp_path / "corpus.parquet")
    metrics = str(tmp_path / "metrics.parquet")
    f1 = curate_batch(spark, spark.createDataFrame(BATCH_A, SCHEMA), 0,
                      corpus, metrics)
    assert f1 == {"kept": 5}
    f2 = curate_batch(spark, spark.createDataFrame(BATCH_B, SCHEMA), 1,
                      corpus, metrics)
    assert f2 == {"exact_dup_hist": 3, "kept": 2}
    kept = spark.read.parquet(corpus)
    assert kept.count() == 7
    assert kept.select("text").distinct().count() == 7
    m = {(r.batch_id, r.fate): r.n_docs
         for r in spark.read.parquet(metrics).collect()}
    assert m[(1, "exact_dup_hist")] == 3 and m[(1, "kept")] == 2


def test_run_curate_stream_end_to_end(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two files -> with maxFilesPerTrigger=1, (usually) two batches;
    # the assertions below hold under ANY batch split: duplicates are
    # dropped either as exact_dup (same batch) or exact_dup_hist
    # (later batch), and the corpus ends unique either way.
    spark.createDataFrame(BATCH_A, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(docs_dir)
    spark.createDataFrame(BATCH_B, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(docs_dir)

    run_curate_stream(spark, docs_dir, out, ckpt)

    kept = spark.read.parquet(os.path.join(out, "curated.parquet"))
    assert kept.count() == 7
    assert kept.select("text").distinct().count() == 7
    m = spark.read.parquet(os.path.join(out, "curation_metrics.parquet"))
    by_fate = {
        r.fate: r.n for r in
        m.groupBy("fate").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert by_fate.get("exact_dup", 0) + by_fate.get("exact_dup_hist", 0) == 3
    assert by_fate["kept"] == 7

    # drained stream is idempotent: re-running with the same
    # checkpoint sees no new files and appends nothing
    run_curate_stream(spark, docs_dir, out, ckpt)
    assert spark.read.parquet(os.path.join(out, "curated.parquet")) \
        .count() == 7
