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


def test_incremental_merge_equals_rebuild(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") % 5 != 0)
    inc = docs.where(F.col("doc_id") % 5 == 0)

    from pdf_parser_spark.jobs.term_index import merge_term_index

    p_old = str(tmp_path / "old")
    p_merged = str(tmp_path / "merged")
    p_full = str(tmp_path / "full")
    build_term_index(old, p_old)
    merge_term_index(spark, p_old, inc, p_merged)
    build_term_index(docs, p_full)

    pm, sm = load_term_index(spark, p_merged)
    pf, sf_ = load_term_index(spark, p_full)
    # identical postings relation
    assert sorted(map(tuple, pm.collect())) == sorted(map(tuple, pf.collect()))
    # identical corpus scalars at the grain BM25 sees
    rm, rf = sm.head(), sf_.head()
    assert rm["n_docs"] == rf["n_docs"]
    assert abs(rm["avgdl"] - rf["avgdl"]) < 1e-9
    # and the served results match the inline operator exactly
    merged = _rows(bm25_topk_indexed(pm, sm, QUERY, k=10))
    assert merged == _rows(terms.bm25_topk(docs, QUERY, k=10))
