"""Exact heavy hitters (operators/freq.py): Misra-Gries containment
(never misses a true heavy hitter), bounded candidate state, result
EXACTLY equal to the naive full groupBy at any partitioning, DuckDB
twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.freq import (
    heavy_hitters,
    heavy_hitters_sql,
    mg_candidates,
)

# Zipf-ish corpus: "alpha" dominates, "beta"/"gamma" mid, long tail of
# singletons. 40 alpha + 20 beta + 10 gamma + 30 singletons = 100.
TEXTS = (
    [" ".join(["alpha"] * 8 + ["beta"] * 4 + ["gamma"] * 2)] * 5
    + [" ".join(f"tail{i}_{j}" for j in range(6)) for i in range(5)]
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def exact(docs, phi):
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    ).where("term != ''")
    total = toks.count()
    return {
        r.term: r.cnt
        for r in toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > int(phi * total))
        .collect()
    }


def test_matches_naive_exact(spark, docs):
    got = {r.term: r.cnt for r in heavy_hitters(docs, phi=0.05).collect()}
    assert got == exact(docs, 0.05) == {"alpha": 40, "beta": 20, "gamma": 10}


def test_partitioning_invariant(spark, docs):
    for n in (1, 7):
        got = {
            r.term: r.cnt
            for r in heavy_hitters(docs.repartition(n), phi=0.05).collect()
        }
        assert got == {"alpha": 40, "beta": 20, "gamma": 10}, n


def test_containment_at_tight_k(spark, docs):
    """k at the guarantee floor (ceil(1/phi)+1) still never misses —
    the tail singletons evict each other, not the heavy hitters."""
    got = {
        r.term: r.cnt
        for r in heavy_hitters(docs.repartition(3), phi=0.2, k=6).collect()
    }
    # beta (20 of 100 tokens) sits exactly AT the threshold and is
    # correctly excluded by the strict > floor(phi * total) compare
    assert got == {"alpha": 40}


def test_candidate_state_bounded(spark, docs):
    k = 8
    cand = mg_candidates(docs.repartition(4), k=k)
    assert cand.count() <= 4 * (k - 1)
    assert {r.term for r in cand.collect()} >= {"alpha"}


def test_guard_rails(spark, docs):
    with pytest.raises(ValueError):
        heavy_hitters(docs, phi=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(docs, phi=0.5, k=1)
    with pytest.raises(ValueError):
        mg_candidates(docs, k=1)


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [("x x x",), (None,), ("",), ("  ",)], "text string"
    )
    got = {r.term: r.cnt for r in heavy_hitters(df, phi=0.5).collect()}
    assert got == {"x": 3}


def test_duckdb_twin_parity(spark, docs):
    rows = [(t,) for t in TEXTS]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", rows)
    want = {
        (r[0], r[1])
        for r in con.execute(heavy_hitters_sql(phi=0.05)).fetchall()
    }
    got = {(r.term, r.cnt) for r in heavy_hitters(docs, phi=0.05).collect()}
    assert got == want
