"""Containment (overlap-coefficient) pairs, edit-distance verify, and
personalized PageRank (operators/dedup.py, operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import dedup
from pdf_parser_spark.operators.graph import (
    pagerank_personalized,
)

SF = "/root/testdata/sf0.001"


def test_overlap_catches_containment_jaccard_misses(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    wrapper = ("nav home about contact " + base
               + " footer terms privacy copyright notice body " * 4)
    docs = spark.createDataFrame(
        [(1, base), (2, wrapper), (3, "totally different words here")],
        "doc_id long, text string",
    )
    ov = dedup.ngram_overlap_pairs(docs, shingle_n=3, threshold=0.9)
    rows = {(r.id_a, r.id_b): r for r in ov.collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r.overlap == 1.0 and r.cont_a == 1.0 and r.cont_b < 0.5
    # symmetric jaccard misses the same pair at any near-dup threshold
    jc = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.5)
    assert not [x for x in jc.collect() if (x.id_a, x.id_b) == (1, 2)]


def test_overlap_twin(spark):
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in dedup.ngram_overlap_pairs(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(con.execute(dedup.ngram_overlap_pairs_sql()).fetchall())
    assert got == want and got


def test_edit_verify_confirms_and_rejects(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumped over the lazy dog"),
         (3, "entirely unrelated content with other words")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {(r.id_a, r.id_b): r
           for r in dedup.edit_verify_pairs(docs, pairs, 0.8).collect()}
    assert (1, 2) in out and (1, 3) not in out
    r = out[(1, 2)]
    assert r.lev == 2 and r.max_len == 44       # 'jumps'→'jumped' edit
    assert abs(r.edit_sim - round(1 - 2 / 44, 6)) < 1e-9


def test_edit_verify_band_equals_plain_always(spark):
    """Since the round-4 advisor fix, max_dist is purely a fast path:
    band-rejected pairs that the threshold could still accept fall
    back to the exact DP, so banded output == plain output for EVERY
    max_dist, not just sufficiently wide ones."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cands = dedup.minhash_lsh_candidates(docs)
    plain = sorted(
        tuple(r)
        for r in dedup.edit_verify_pairs(docs, cands, 0.5).collect()
    )
    for md in (200, 10):
        banded = sorted(
            tuple(r)
            for r in dedup.edit_verify_pairs(
                docs, cands, 0.5, max_dist=md
            ).collect()
        )
        assert banded == plain, md
    assert plain


def test_edit_verify_narrow_band_recovers_near_dups(spark):
    """A max_dist SMALLER than (1-threshold)*max_len must not lose
    above-threshold pairs (the advisor's silent-loss scenario)."""
    a = "x" * 100
    b = "x" * 90 + "y" * 10                  # lev 10, sim 0.9
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = dedup.edit_verify_pairs(
        docs, pairs, 0.8, max_dist=3        # band says -1; 3 < 20
    ).collect()
    assert len(out) == 1 and out[0].lev == 10
    assert abs(out[0].edit_sim - 0.9) < 1e-9


def test_ppr_locality_and_validation(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "e"), ("e", "c"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.rank
           for r in pagerank_personalized(df, ["a"]).collect()}
    # mass concentrates around the seed; the disconnected x/y pair
    # gets nothing (no teleport, no path)
    assert got["a"] > got["e"] and got["x"] == 0.0 and got["y"] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-5
    with pytest.raises(ValueError):
        pagerank_personalized(df, [])
    with pytest.raises(ValueError):
        pagerank_personalized(df, ["not-in-graph"])


def test_keep_best_prefers_quality_over_id(spark):
    docs = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 99.0), (4, 5.0), (9, 1.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )  # cluster {1,2,3}; 4 and 9 unpaired
    kept = sorted(
        r.doc_id
        for r in dedup.keep_best(docs, pairs, "score").collect()
    )
    # highest score wins, tie (2 vs 3) broken by lowest id; unpaired
    # docs always survive — keep_canonical would have kept 1 instead
    assert kept == [2, 4, 9]
    canon = sorted(
        r.doc_id for r in dedup.keep_canonical(docs, pairs).collect()
    )
    assert canon == [1, 4, 9]
