"""DSIR importance resampling (operators/dsir.py): weight semantics,
gram-less documents, and Gumbel-top-n determinism."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import dsir

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_weights_favor_target_like_documents(spark):
    """With the English subcorpus as target, English raw docs must
    score higher on average than non-English ones — the entire point
    of the estimator."""
    d = _docs(spark)
    w = dsir.dsir_weights(d, d.where(F.col("lang") == "en"),
                          n_buckets=512)
    joined = w.join(d.select("doc_id", "lang"), "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in joined.groupBy("lang")
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert means["en"] > means["zh"], means
    assert means["en"] > means["fr"], means


def test_gramless_document_gets_zero_weight(spark):
    d = spark.createDataFrame(
        [(1, "real words flow here nicely"), (2, "1234 ... 5678 !!")],
        "doc_id bigint, text string",
    )
    t = spark.createDataFrame(
        [(9, "real words appear in the target too")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r.log_weight
            for r in dsir.dsir_weights(d, t, n_buckets=64).collect()}
    assert rows[2] == 0.0
    assert rows[1] != 0.0


def test_topn_is_deterministic_and_weight_biased(spark):
    """Two runs agree row-for-row; the selected set's mean weight
    beats the corpus mean (sampling proportional to w must enrich)."""
    d = _docs(spark)
    t = d.where(F.col("lang") == "en")
    a = dsir.dsir_topn(d, t, n=50, n_buckets=512, salt="s").collect()
    b = dsir.dsir_topn(d, t, n=50, n_buckets=512, salt="s").collect()
    assert [(r.doc_id, r.gumbel_key) for r in a] == [
        (r.doc_id, r.gumbel_key) for r in b
    ]
    assert len(a) == 50
    corpus_mean = dsir.dsir_weights(d, t, n_buckets=512).agg(
        F.avg("log_weight")
    ).first()[0]
    sample_mean = sum(r.log_weight for r in a) / len(a)
    assert sample_mean > corpus_mean


def test_bigrams_present_in_feature_stream(spark):
    """The gram stream carries bigrams: two docs sharing every unigram
    but differing in order must land in different bucket profiles."""
    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id bigint, text string",
    )
    counts = dsir.doc_bucket_counts(d, n_buckets=4096).collect()
    prof = {}
    for r in counts:
        prof.setdefault(r.doc_id, set()).add((r.bucket, r.cnt))
    assert prof[1] != prof[2]
