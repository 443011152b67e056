"""Materialized dedup index (jobs/dedup_index.py): the written
(id, band_key) relation must drive minhash_lsh_candidates to exactly
the inline result — the resume-style guarantee that lets a 100 TB
deployment pay the signature pass once and dedup many times."""

from pyspark.sql import functions as F

from pdf_parser_spark.jobs.dedup_index import (
    build_dedup_index, load_dedup_index,
)
from pdf_parser_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r.id_a, r.id_b) for r in df.collect())


def test_index_candidates_match_inline(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inline = _pairs(dedup.minhash_lsh_candidates(docs))

    idx_path = str(tmp_path / "lsh_index")
    build_dedup_index(docs, idx_path)
    index = load_dedup_index(spark, idx_path)
    from_index = _pairs(dedup.minhash_lsh_candidates(docs, index=index))

    assert from_index == inline and len(inline) > 0
    # the index path must not recompute signatures: its plan reads the
    # parquet index, not the documents text column
    plan = dedup.minhash_lsh_candidates(
        docs, index=index
    )._jdf.queryExecution().executedPlan().toString()
    assert "band_key:string" in plan     # scans the index relation…
    assert "md5" not in plan             # …recomputes no signatures
    assert "documents" not in plan       # …never touches the corpus


def test_index_relation_shape(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx_path = str(tmp_path / "lsh_index")
    build_dedup_index(docs, idx_path, partitions=4)
    index = load_dedup_index(spark, idx_path)
    assert index.columns == ["doc_id", "band_key"]
    # one row per (shingled doc, band)
    n_shingled = docs.where(
        F.size(F.split(F.trim("text"), r"\s+")) >= 5
    ).where(F.trim("text") != "").count()
    assert index.count() == n_shingled * dedup.N_BANDS


def test_index_cap_applies_on_read(spark, tmp_path):
    # the max_bucket gate runs on the INDEX path too — a degenerate
    # bucket materialized into the index still never fans out
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    df = spark.createDataFrame(
        [(i, base) for i in range(30)], "doc_id long, text string"
    )
    idx_path = str(tmp_path / "idx")
    build_dedup_index(df, idx_path)
    index = load_dedup_index(spark, idx_path)
    assert dedup.minhash_lsh_candidates(
        df, index=index, max_bucket=10
    ).count() == 0
    assert dedup.minhash_lsh_candidates(
        df, index=index
    ).count() == 30 * 29 // 2
