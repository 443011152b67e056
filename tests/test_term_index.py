"""Materialized inverted index (jobs/term_index.py): the indexed BM25
path must reproduce the inline `bm25_topk` exactly, serve queries with
no corpus scan or tokenize, and push the query-term filter into the
postings scan — the pay-tokenize-once contract a 100 TB retrieval
deployment runs on."""

from pyspark.sql import functions as F

from pdf_parser_spark.jobs.term_index import (
    bm25_topk_indexed, build_term_index, load_term_index,
)
from pdf_parser_spark.operators import terms

SF = "/root/testdata/sf0.001"

QUERY = ["data", "crawl", "quality"]


def _rows(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def test_indexed_bm25_matches_inline(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inline = _rows(terms.bm25_topk(docs, QUERY, k=10))

    path = str(tmp_path / "term_index")
    build_term_index(docs, path)
    postings, stats = load_term_index(spark, path)
    indexed = _rows(bm25_topk_indexed(postings, stats, QUERY, k=10))

    assert indexed == inline and len(inline) == 10


def test_query_plan_never_touches_corpus(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "term_index")
    build_term_index(docs, path)
    postings, stats = load_term_index(spark, path)
    q = bm25_topk_indexed(postings, stats, QUERY, k=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all" not in plan   # no tokenize
    assert "documents" not in plan            # no corpus scan
    # the term filter is pushed into the postings parquet scan, so
    # term-clustered files prune at row-group min/max granularity
    assert "PushedFilters: [In(term" in plan


def test_stats_count_termless_documents(spark, tmp_path):
    # a doc with no extractable terms has no postings row but still
    # counts toward n_docs/avgdl, exactly as in the inline bm25_topk
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "1234 !!"), (3, "alpha gamma delta "
                                                "beta")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    build_term_index(df, path)
    postings, stats = load_term_index(spark, path)
    s = stats.collect()[0]
    assert s.n_docs == 3.0
    assert s.avgdl == (2 + 0 + 4) / 3.0
    assert postings.where(F.col("doc_id") == 2).count() == 0
    inline = _rows(terms.bm25_topk(df, ["alpha"], k=3))
    assert _rows(bm25_topk_indexed(postings, stats, ["alpha"], k=3)) \
        == inline


def test_postings_shape(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "idx")
    build_term_index(docs, path, partitions=4)
    postings, _ = load_term_index(spark, path)
    assert postings.columns == ["term", "doc_id", "tf", "dl"]
    # one row per distinct (term, doc)
    assert (
        postings.groupBy("term", "doc_id").count().where("count > 1")
        .count() == 0
    )
