"""Positional n-gram operators (operators/spans.py): duplicated-span
detection semantics (Lee et al. 2022-shaped), decontamination, and the
deterministic training-shuffle writer."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.sampling import (
    shuffle_assignment,
    write_shuffled,
)
from pdf_parser_spark.operators.spans import (
    benchmark_ngram_hashes,
    contamination,
    decontaminate,
    dup_span_stats,
    dup_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Hand-built corpus with known duplicated spans (n=3 tests):
    - docs 1 and 2 share the leading 5 words -> three 3-grams each,
      merging into ONE span [1, 5].
    - doc 3 repeats its own 4-word phrase -> within-doc duplication.
    - doc 4 is unique -> no spans.
    - doc 5 is empty.
    """
    rows = [
        (1, "alpha beta gamma delta epsilon zeta unique1 unique2"),
        (2, "alpha beta gamma delta epsilon other1 other2 other3"),
        (3, "p q r s xx p q r s yy"),
        (4, "totally fresh words nothing shared here at all"),
        (5, "   "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).persist()


def _spans(df, **kw):
    return {
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(df, n=3, **kw).collect()
    }


def test_dup_spans_cross_doc_merge(corpus):
    got = _spans(corpus)
    # docs 1/2: 3-grams at positions 1,2,3 overlap-merge into [1,5]
    assert (1, 1, 5) in got
    assert (2, 1, 5) in got
    # doc 3: "p q r s" at positions 1 and 6 -> two spans [1,4], [6,9]
    assert (3, 1, 4) in got
    assert (3, 6, 9) in got
    # unique and empty docs produce nothing
    assert not [s for s in got if s[0] in (4, 5)]


def test_dup_spans_never_overlap_within_doc(corpus):
    rows = dup_spans(corpus, n=3).orderBy("doc_id", "span_start").collect()
    by_doc = {}
    for r in rows:
        assert r.span_end - r.span_start + 1 >= 3
        prev = by_doc.get(r.doc_id)
        if prev is not None:
            assert r.span_start > prev + 1  # merged if touching
        by_doc[r.doc_id] = r.span_end


def test_dup_span_stats_fraction(corpus):
    stats = {r.doc_id: r for r in dup_span_stats(corpus, n=3).collect()}
    assert set(stats) == {1, 2, 3, 4, 5}  # every doc gets a row
    assert stats[1].dup_words == 5 and stats[1].n_words == 8
    assert stats[1].dup_frac == round(5 / 8, 6)
    assert stats[3].dup_words == 8  # two 4-word spans
    assert stats[4].dup_words == 0 and stats[4].dup_frac == 0.0
    assert stats[5].n_words == 0 and stats[5].dup_frac == 0.0


def test_dup_spans_min_count(corpus):
    # min_count=3: the doc-1/doc-2 pair (each n-gram twice) drops out;
    # only n-grams occurring >= 3 times corpus-wide survive (none here)
    assert _spans(corpus, min_count=3) == set()
    with pytest.raises(ValueError):
        dup_spans(corpus, min_count=1)


def test_strip_dup_spans(corpus):
    from pdf_parser_spark.operators.spans import strip_dup_spans

    out = {r.doc_id: r for r in strip_dup_spans(corpus, n=3).collect()}
    assert out[1].text == "zeta unique1 unique2"  # span [1,5] removed
    assert out[1].n_words_kept == 3
    assert out[3].text == "xx yy"  # both repeated phrases cut
    assert out[4].text == corpus.where("doc_id = 4").first().text
    assert out[5].text == "" and out[5].n_words_kept == 0


def test_contamination_and_decontaminate(corpus, spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    bh = benchmark_ngram_hashes(bench, n=3)
    hits = {r.doc_id: r.n_hits for r in contamination(corpus, bh, n=3).collect()}
    # docs 1 and 2 contain all three benchmark 3-grams; others clean
    assert hits == {1: 3, 2: 3}
    kept = {r.doc_id for r in decontaminate(corpus, bh, n=3).collect()}
    assert kept == {3, 4, 5}
    # empty benchmark contaminates nothing
    none = benchmark_ngram_hashes(
        spark.createDataFrame([(0, "")], ["doc_id", "text"]), n=3)
    assert contamination(corpus, none, n=3).count() == 0


def test_shuffle_assignment_deterministic(corpus):
    a = shuffle_assignment(corpus, 4, salt="s")
    rows = {(r.doc_id, r.part, r.sort_key) for r in a.collect()}
    assert rows == {
        (r.doc_id, r.part, r.sort_key)
        for r in shuffle_assignment(corpus, 4, salt="s").collect()
    }
    assert all(0 <= p < 4 for _, p, _ in rows)
    with pytest.raises(ValueError):
        shuffle_assignment(corpus, 0)


def test_mix_corpus_proportions(spark):
    from pdf_parser_spark.operators.sampling import mix_corpus, mix_thresholds

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 6, "en")
        .when(F.col("id") % 10 < 9, "de")
        .otherwise("xx")
        .alias("lang"),
    )
    # counts: en 2400, de 1200, xx 400; weights 1:1 -> T bound by de
    out = mix_corpus(df, {"en": 0.5, "de": 0.5}, key_col="lang")
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert "xx" not in got            # unweighted strata dropped
    assert got["de"] == 1200          # binding stratum kept whole
    assert abs(got["en"] - 1200) < 120  # ~rate 0.5 of 2400, hash noise
    # determinism
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {r.doc_id for r in
         mix_corpus(df, {"en": 0.5, "de": 0.5}, key_col="lang")
         .select("doc_id").collect()}
    assert a == b

    with pytest.raises(ValueError, match="infeasible"):
        mix_corpus(df, {"en": 1.0, "missing": 1.0}, key_col="lang")
    assert mix_thresholds({"en": 10}, {"en": 1.0, "gone": 1.0},
                          strict=False) == {"en": 1152921504606846976}
    with pytest.raises(ValueError):
        mix_thresholds({"en": 10}, {})
    with pytest.raises(ValueError):
        mix_thresholds({"en": 10}, {"en": -1.0})


def test_write_shuffled_sorted_files(spark, tmp_path):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    out = os.path.join(str(tmp_path), "shuffled")
    write_shuffled(df, out, n_parts=8, salt="s")
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    # part values hash to tasks, so collisions can leave some of the 8
    # task partitions empty (no file) — several is enough to prove the
    # repartition spread
    assert 2 <= len(files) <= 8
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(
        range(2000)
    )
    # each physical file is internally sorted by the assignment's
    # (sort_key, doc_id) — the property a sequential trainer consumes
    asg = {
        r.doc_id: r.sort_key
        for r in shuffle_assignment(df, 8, salt="s").collect()
    }
    import pyarrow.parquet as pq

    for f in files:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        keys = [(asg[i], i) for i in ids]
        assert keys == sorted(keys)
