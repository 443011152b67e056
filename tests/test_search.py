"""Trigram substring search (operators/search.py): indexed result ==
naive full-scan filter, candidate pruning actually prunes, the
gram filter pushes into the postings parquet scan, and the short-
needle fallback stays correct."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import search as se

SF = "/root/testdata/sf0.001"


def _hits(df):
    return sorted((r.doc_id, r.n_hits) for r in df.collect())


def _naive(docs, needle):
    t = F.lower(F.col("text"))
    nl = needle.lower()
    return sorted(
        (r.doc_id, r.n)
        for r in docs.where(t.contains(nl))
        .select(
            "doc_id",
            ((F.length(t) - F.length(F.replace(t, F.lit(nl))))
             / len(nl)).cast("long").alias("n"),
        )
        .collect()
    )


def test_indexed_equals_naive(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for needle in ["fast table", "spark", "Key AGG", "absent zz"]:
        assert _hits(se.substring_search(docs, needle)) == _naive(
            docs, needle
        )


def test_case_insensitive_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "Banana banana BANANA"), (2, "no fruit"), (3, "banal")],
        "doc_id long, text string",
    )
    assert _hits(se.substring_search(docs, "BaNaNa")) == [(1, 3)]


def test_short_needle_fallback(spark):
    docs = spark.createDataFrame(
        [(1, "xyxy"), (2, "yy")], "doc_id long, text string"
    )
    assert _hits(se.substring_search(docs, "xy")) == [(1, 2)]


def test_candidates_prune_before_verify(spark):
    # a doc sharing SOME but not ALL needle trigrams is pruned by the
    # count-match (never reaches the contains verify)
    docs = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcxxx"), (3, "defxxx")],
        "doc_id long, text string",
    )
    postings = se.trigram_postings(docs)
    grams = se._needle_grams("abcdef")
    cand = (
        postings.where(F.col("gram").isin(grams))
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("ng"))
        .where(F.col("ng") == len(grams))
    )
    assert [r.doc_id for r in cand.collect()] == [1]
    assert _hits(se.substring_search(docs, "abcdef")) == [(1, 1)]


def test_materialized_index_pushes_gram_filter(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "trgm")
    se.write_trigram_index(docs, path)
    postings = spark.read.parquet(path)
    q = se.substring_search(docs, "fast table", postings=postings)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the gram IN (...) predicate reaches the postings scan: term-
    # clustered files prune at row-group min/max granularity
    assert "PushedFilters: [In(gram" in plan
    assert _hits(q) == _naive(docs, "fast table")


def test_postings_distinct_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "abcabcabc"), (2, None)], "doc_id long, text string"
    )
    rows = sorted(
        (r.gram, r.doc_id) for r in se.trigram_postings(docs).collect()
    )
    assert rows == [("abc", 1), ("bca", 1), ("cab", 1)]


def test_postings_sql_twin_parity(spark):
    """trigram_postings_sql must stay a faithful twin of the staged
    Spark build (they use different gram-assembly forms)."""
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet").where(
        "doc_id < 50"
    )
    got = sorted(
        (r.gram, r.doc_id) for r in se.trigram_postings(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d50 AS SELECT * FROM '{SF}/documents.parquet'"
        " WHERE doc_id < 50"
    )
    want = sorted(con.execute(se.trigram_postings_sql("d50")).fetchall())
    assert got == want and len(got) > 100
