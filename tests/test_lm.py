"""CCNet perplexity scoring (operators/lm.py): model semantics,
token-poor documents, tercile bucketing, determinism."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import lm

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_target_language_scores_lower_perplexity(spark):
    """Under an English-trained model, English documents must have
    lower mean perplexity than non-English ones — the CCNet signal."""
    d = _docs(spark)
    ppl = lm.lm_perplexity(d, d.where(F.col("lang") == "en"),
                           n_buckets=512)
    joined = ppl.join(d.select("doc_id", "lang"), "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in joined.groupBy("lang")
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    assert means["en"] < means["zh"], means
    assert means["en"] < means["fr"], means


def test_token_poor_document_gets_null_ppl(spark):
    d = spark.createDataFrame(
        [(1, "plenty of words to model here"), (2, "hi"), (3, "12 34 !!")],
        "doc_id bigint, text string",
    )
    t = spark.createDataFrame(
        [(9, "plenty of words appear in the target model")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r.ppl
            for r in lm.lm_perplexity(d, t, n_buckets=64).collect()}
    assert rows[1] is not None
    assert rows[2] is None  # single token: no bigram evidence
    assert rows[3] is None  # no [a-z]{2,} tokens at all


def test_seen_text_beats_unseen_text(spark):
    """A document repeating the training text must score lower ppl
    than one made of buckets the model never saw."""
    t = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "zzqx wvuk pltn mrbs gfhd jklw qpzm xcvb"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r.ppl
            for r in lm.lm_perplexity(d, t, n_buckets=4096).collect()}
    assert rows[1] < rows[2], rows


def test_buckets_are_balanced_terciles_and_ordered(spark):
    """Per language: head/middle/tail sizes differ by at most one and
    every head ppl <= every tail ppl."""
    d = _docs(spark)
    bk = lm.perplexity_buckets(d, d.where(F.col("lang") == "en"),
                               n_buckets=512)
    rows = bk.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.ppl)
    for lang, groups in by_lang.items():
        sizes = sorted(len(v) for v in groups.values())
        assert sizes[-1] - sizes[0] <= 1, (lang, sizes)
        assert max(groups["head"]) <= min(groups["tail"]), lang


def test_perplexity_deterministic(spark):
    d = _docs(spark)
    t = d.where(F.col("lang") == "en")
    a = sorted(lm.lm_perplexity(d, t, n_buckets=512).collect())
    b = sorted(lm.lm_perplexity(d, t, n_buckets=512).collect())
    assert a == b
