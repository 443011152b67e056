"""Corpus term statistics (operators/terms.py)."""

import math

from pdf_parser_spark.operators.terms import term_df, tfidf_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple common"),
            (2, "banana cherry common"),
            (3, "cherry dates common"),
            (4, "unique common"),
        ],
        ["doc_id", "text"],
    )


def test_term_df_band(spark):
    got = {r.term: r.df for r in term_df(_corpus(spark)).collect()}
    # hapaxes (apple/dates/unique, df=1 < min_df=2) and the Zipf head
    # (common, df=4 > 0.5*4) are both dropped
    assert got == {"banana": 2, "cherry": 2}


def test_tfidf_topk_scores_and_tiebreak(spark):
    rows = tfidf_topk(_corpus(spark), k=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc  # every term of doc 4 fell outside the band
    exp = round(1 * (math.log(5.0 / 3.0) + 1.0), 6)
    assert [(r.term, r.tf, r.score, r.rank) for r in by_doc[1]] == [
        ("banana", 1, exp, 1)
    ]
    # doc 2: equal scores -> tie breaks on term asc
    assert [(r.term, r.rank) for r in sorted(by_doc[2], key=lambda r: r.rank)] \
        == [("banana", 1), ("cherry", 2)]


def test_tfidf_window_is_pre_pruned(spark):
    plan = (
        tfidf_topk(_corpus(spark), k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_bm25_topk_matches_reference_formula(spark):
    import math

    from pdf_parser_spark.operators.terms import bm25_topk

    corpus = [
        (1, "spark joins data with spark speed"),
        (2, "data data data tables rows"),
        (3, "spark only"),
        (4, "nothing relevant here at all friends"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: r.score for r in
           bm25_topk(df, ["spark", "data"], k=3).collect()}

    # independent reference computation
    toks = {i: [w for w in t.split() if len(w) >= 2] for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {q: sum(q in v for v in toks.values()) for q in ("spark", "data")}
    k1, b = 1.2, 0.75

    def score(i):
        s = 0.0
        for q, d in dfs.items():
            tf = toks[i].count(q)
            if tf:
                idf = math.log(1 + (n - d + 0.5) / (d + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
        return round(s, 6)

    want = sorted(((score(i), -i) for i in toks if score(i) > 0),
                  reverse=True)[:3]
    assert got == {-i: s for s, i in want}
    for i, s in got.items():
        assert abs(s - score(i)) < 1e-6


# --------------------------------------------------- reciprocal rank fusion

def test_rrf_fuse_semantics(spark):
    from pdf_parser_spark.operators.terms import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], k_const=60, topk=4).collect()
    got = {r.doc_id: (r.rrf_score, r.n_lists) for r in rows}
    assert got[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got[2] == (round(1 / 62, 6), 1)
    assert got[9] == (round(1 / 63, 6), 1)
    # doc 1 (ranks 1+2) outscores doc 3 (ranks 3+1)
    order = [r.doc_id for r in rows]
    assert order[0] == 1 and order[1] == 3


def test_rrf_fuse_twin(spark):
    import duckdb

    from pdf_parser_spark.operators.terms import rrf_fuse, rrf_fuse_sql

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank long")
    got = sorted(tuple(r) for r in rrf_fuse([a, b], topk=10).collect())
    sql = rrf_fuse_sql([
        "SELECT * FROM (VALUES (1, 1), (2, 2), (3, 3)) t(doc_id, rank)",
        "SELECT * FROM (VALUES (3, 1), (1, 2), (9, 3)) t(doc_id, rank)",
    ], topk=10)
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
