"""GPT-3-style logistic quality classifier (operators/classify.py):
score separation, GD trajectory determinism, intercept-only documents,
and the Pareto keep rule's tail-retention semantics."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import classify

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _split(d):
    return d.where(F.col("lang") == "en"), d.where(F.col("lang") != "en")


def test_scores_separate_positive_class(spark):
    """Trained on en-vs-rest, English documents must score higher on
    average than every other language — the classifier's entire job."""
    d = _docs(spark)
    pos, neg = _split(d)
    scored = classify.quality_classifier_scores(d, pos, neg, n_buckets=512)
    means = {
        r["lang"]: r["m"]
        for r in scored.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg("score").alias("m"))
        .collect()
    }
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m + 0.05, means


def test_training_is_deterministic(spark):
    """Two independent trainings produce bit-identical weights — the
    per-step 6-dp rounding must erase summation-order noise."""
    d = _docs(spark)
    pos, neg = _split(d)
    w1 = classify.train_quality_classifier(pos, neg, n_buckets=256)
    w2 = classify.train_quality_classifier(pos, neg, n_buckets=256)
    assert w1 == w2
    assert classify.INTERCEPT in w1


def test_gramless_document_scores_intercept_only(spark):
    """A document with no extractable grams still gets a score (the
    intercept feature keeps it in the plan) equal to
    sigmoid(w_intercept)."""
    import math

    pos = spark.createDataFrame(
        [(1, "good clean prose for the positive side")],
        "doc_id bigint, text string",
    )
    neg = spark.createDataFrame(
        [(2, "spam spam noisy text negative crawl")],
        "doc_id bigint, text string",
    )
    w = classify.train_quality_classifier(pos, neg, n_buckets=64)
    target = spark.createDataFrame(
        [(7, "1234 !! ...")], "doc_id bigint, text string"
    )
    rows = classify.classifier_scores(target, w, n_buckets=64).collect()
    assert len(rows) == 1
    want = round(1.0 / (1.0 + math.exp(-w[classify.INTERCEPT])), 6)
    assert rows[0]["score"] == want


def test_pareto_select_keeps_low_score_tail(spark):
    """The stochastic threshold must keep SOME low-scoring documents
    (the GPT-3 motivation) while keeping high scorers at a higher
    rate; draws and decisions are deterministic across runs."""
    d = _docs(spark)
    pos, neg = _split(d)
    scored = classify.quality_classifier_scores(d, pos, neg, n_buckets=512)
    a = classify.pareto_select(scored, salt="t").collect()
    b = classify.pareto_select(scored, salt="t").collect()
    assert sorted((r.doc_id, r.draw, r.kept) for r in a) == sorted(
        (r.doc_id, r.draw, r.kept) for r in b
    )
    med = sorted(r.score for r in a)[len(a) // 2]
    lo = [r for r in a if r.score <= med]
    hi = [r for r in a if r.score > med]
    lo_rate = sum(r.kept for r in lo) / len(lo)
    hi_rate = sum(r.kept for r in hi) / len(hi)
    assert hi_rate > lo_rate
    assert any(r.kept for r in lo), "hard cutoff — tail lost"


def test_spark_matches_duckdb_twin(spark):
    """Bit-exact cross-engine parity of train+score+select on the
    fixture corpus (the graded oracle contract)."""
    import duckdb

    d = _docs(spark)
    pos, neg = _split(d)
    scored = classify.quality_classifier_scores(d, pos, neg, n_buckets=512)
    got = {
        (r.doc_id, r.score, r.draw, r.kept)
        for r in classify.pareto_select(scored, salt="x").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    sql = classify.pareto_select_sql(
        classify.quality_classifier_scores_sql(
            "documents",
            "(SELECT * FROM documents WHERE lang = 'en')",
            "(SELECT * FROM documents WHERE lang <> 'en')",
            n_buckets=512,
        ),
        salt="x",
    )
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want
