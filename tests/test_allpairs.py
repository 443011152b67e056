"""Exact all-pairs tf-idf cosine with Bayardo prefix filtering
(operators/allpairs.py): result == naive threshold join, the prefix
actually prunes candidates, numpy agreement on a hand-built corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import allpairs as ap

SF = "/root/testdata/sf0.001"


def _naive_pairs(spark, docs, t, min_df=2, max_df_frac=0.5):
    posts = ap.tfidf_unit_postings(docs, min_df=min_df,
                                   max_df_frac=max_df_frac)
    p1 = posts.selectExpr("doc_id AS id1", "term", "w AS w1")
    p2 = posts.selectExpr("doc_id AS id2", "term", "w AS w2")
    return sorted(
        tuple(r)
        for r in p1.join(p2, "term")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("s"))
        .where(F.col("s") >= t)
        .select("id1", "id2", F.round("s", 6).alias("sim"))
        .collect()
    )


@pytest.mark.parametrize("t", [0.25, 0.6, 0.9])
def test_equals_naive_threshold_join(spark, t):
    # max_df_frac=0.95: the synthetic corpus's whole vocabulary sits
    # above df 0.5N (Zipf-flat by construction), so the production
    # default would leave single-feature vectors only
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in
                 ap.allpairs_cosine(docs, t, max_df_frac=0.95).collect())
    assert got == _naive_pairs(spark, docs, t, max_df_frac=0.95)
    assert all(s >= round(t - 1e-6, 6) for _, _, s in got)


def test_prefix_prunes_candidates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = 0.6
    posts = ap.tfidf_unit_postings(docs, max_df_frac=0.95)
    from pyspark.sql import Window

    suffix = F.sum(F.col("w") * F.col("w")).over(
        Window.partitionBy("doc_id")
        .orderBy(F.col("w").desc(), F.col("term"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    n_prefix = posts.withColumn("s", suffix).where(
        F.col("s") >= t * t).count()
    n_full = posts.count()
    # at a near-dup threshold most of every vector's mass is tail
    assert n_prefix < 0.7 * n_full


def test_numpy_hand_corpus(spark):
    texts = [
        (0, "apple banana apple cherry"),
        (1, "apple banana cherry"),
        (2, "dog eagle dog ferret"),
        (3, "dog eagle ferret"),
        (4, "apple dog banana eagle"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    # min_df=1/max_df_frac=1 keeps every term: clean numpy comparison
    got = {(r.id1, r.id2): r.sim
           for r in ap.allpairs_cosine(
               docs, 0.2, min_df=1, max_df_frac=1.0).collect()}

    vocab = sorted({w for _, t in texts for w in t.split()})
    N = len(texts)
    dfreq = {v: sum(v in t.split() for _, t in texts) for v in vocab}
    idf = {v: round(np.log((N + 1) / (dfreq[v] + 1)) + 1, 6) for v in vocab}
    vecs = []
    for _, t in texts:
        v = np.array([t.split().count(w) * idf[w] for w in vocab])
        vecs.append(v / np.linalg.norm(v))
    for i in range(N):
        for j in range(i + 1, N):
            sim = float(vecs[i] @ vecs[j])
            if sim >= 0.2:
                assert abs(got[(i, j)] - sim) < 1e-5, (i, j)
            else:
                assert (i, j) not in got


def test_bad_threshold_raises(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ap.allpairs_cosine(docs, 0.0)
