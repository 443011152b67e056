"""Count-min sketch (operators/sketches.py): estimate >= truth with
equality at adequate width, merge = sum, DuckDB twin bit-parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.sketches import (
    cms_build,
    cms_build_sql,
    cms_estimate,
    cms_estimate_sql,
    cms_merge,
)

TEXTS = [
    "spark spark spark table row row",
    "table table spark value",
    "row spark the the the the value",
]
TERMS = ["spark", "table", "row", "the", "value", "missing"]
TRUE = {"spark": 5, "table": 3, "row": 3, "the": 4, "value": 2, "missing": 0}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_estimate_upper_bounds_truth(spark, docs):
    cms = cms_build(docs, depth=4, width=64)
    est = {r.term: r.est for r in cms_estimate(cms, TERMS, depth=4, width=64).collect()}
    assert set(est) == set(TERMS)
    for t in TERMS:
        assert est[t] >= TRUE[t], t
    # at width 64 over 6 distinct tokens collisions are overwhelmingly
    # unlikely in EVERY one of 4 rows — the min recovers exact counts
    assert est == TRUE


def test_narrow_width_still_upper_bounds(spark, docs):
    cms = cms_build(docs, depth=2, width=2)
    est = {r.term: r.est for r in cms_estimate(cms, TERMS, depth=2, width=2).collect()}
    for t in TERMS:
        assert est[t] >= TRUE[t], t


def test_sketch_size_capped(spark, docs):
    cms = cms_build(docs, depth=3, width=8)
    assert cms.count() <= 3 * 8
    assert cms.agg(F.sum("c")).collect()[0][0] == 3 * sum(TRUE.values())


def test_merge_is_cellwise_sum(spark, docs):
    half_a = docs.limit(1)
    half_b = docs.subtract(half_a)
    merged = cms_merge(
        cms_build(half_a, depth=4, width=64),
        cms_build(half_b, depth=4, width=64),
    )
    whole = cms_build(docs, depth=4, width=64)
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in whole.collect())
    assert got == want


def test_duckdb_twins(spark, docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in TEXTS])
    got_cells = sorted(
        tuple(r) for r in cms_build(docs, depth=3, width=32).collect()
    )
    want_cells = sorted(
        tuple(r)
        for r in con.execute(cms_build_sql("docs", depth=3, width=32)).fetchall()
    )
    assert got_cells == want_cells
    got = sorted(
        tuple(r)
        for r in cms_estimate(
            cms_build(docs, depth=3, width=32), TERMS, depth=3, width=32
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            cms_estimate_sql(
                cms_build_sql("docs", depth=3, width=32), TERMS,
                depth=3, width=32,
            )
        ).fetchall()
    )
    assert got == want


def test_hll_estimates_distinct_words(spark):
    from pdf_parser_spark.operators.sketches import (
        hll_distinct,
        hll_distinct_sql,
    )

    # ~300 distinct synthetic words across docs
    texts = [
        " ".join(f"w{i * 7 + j}" for j in range(50)) for i in range(30)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    truth = words.select("w").distinct().count()
    row = hll_distinct(words, "w", b=9).collect()[0]
    assert abs(row.hll_est - truth) / truth < 0.15
    assert row.n_buckets == 512 and 0 < row.n_empty < 512

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in texts])
    want = con.execute(
        hll_distinct_sql(
            "SELECT unnest(string_split(text, ' ')) AS w FROM docs",
            "w", b=9,
        )
    ).fetchone()
    assert (row.hll_est, row.n_buckets, row.n_empty) == want


def test_hll_small_range_correction(spark):
    from pdf_parser_spark.operators.sketches import hll_distinct

    tiny = spark.createDataFrame(
        [(f"v{i}",) for i in range(6)], "w string"
    )
    row = hll_distinct(tiny, "w", b=9).collect()[0]
    # linear-counting regime: estimate lands within 1 of the truth
    assert abs(row.hll_est - 6) < 1.0


# ---------------------------------------------------------------- histogram

def test_histogram_bins_and_overflow(spark):
    from pdf_parser_spark.operators.sketches import histogram

    df = spark.createDataFrame(
        [(x,) for x in [-5.0, 0.0, 1.0, 2.5, 9.9, 10.0, 42.0]], "x double"
    )
    got = {r.bin: (r.lo_edge, r.hi_edge, r.n)
           for r in histogram(df, "x", 0.0, 10.0, n_bins=4).collect()}
    # width 2.5; bin edges exact
    assert got[-1] == (-2.5, 0.0, 1)           # underflow
    assert got[0] == (0.0, 2.5, 2)             # 0.0, 1.0
    assert got[1] == (2.5, 5.0, 1)             # 2.5 lands in bin 1
    assert got[3] == (7.5, 10.0, 1)            # 9.9
    assert got[4] == (10.0, 12.5, 2)           # 10.0 and 42.0 overflow
    assert 2 not in got                        # empty bins not emitted


def test_hist_quantiles_interpolation(spark):
    from pdf_parser_spark.operators.sketches import histogram, hist_quantiles

    # 10 values uniform in [0, 10): quantile estimates interpolate
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    h = histogram(df, "x", 0.0, 10.0, n_bins=5)
    got = {r.q: (r.est, r.est_bin)
           for r in hist_quantiles(h, [0.5, 1.0], n_bins=5).collect()}
    # rank 5 -> bin 2 (values 4,5; cum 6, prev 4): 4 + (5-4)/2*2 = 5.0
    assert got[0.5] == (5.0, 2)
    assert got[1.0] == (10.0, 4)


def test_hist_quantiles_overflow_clamps(spark):
    from pdf_parser_spark.operators.sketches import histogram, hist_quantiles

    df = spark.createDataFrame(
        [(x,) for x in [-9.0, 1.0, 99.0, 99.0, 99.0]], "x double"
    )
    h = histogram(df, "x", 0.0, 10.0, n_bins=2)
    got = {r.q: (r.est, r.est_bin)
           for r in hist_quantiles(h, [0.1, 0.9], n_bins=2).collect()}
    assert got[0.1] == (0.0, -1)    # underflow clamps to its hi edge
    assert got[0.9] == (10.0, 2)    # overflow clamps to its lo edge


def test_hist_quantiles_rejects_zero(spark):
    from pdf_parser_spark.operators.sketches import hist_quantiles, histogram

    df = spark.createDataFrame([(1.0,)], "x double")
    h = histogram(df, "x", 0.0, 10.0, n_bins=2)
    with pytest.raises(ValueError):
        hist_quantiles(h, [0.0])


@pytest.fixture(scope="module")
def real_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def real_con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              "'/root/testdata/sf0.001/documents.parquet'")
    return c


def test_histogram_twin(spark, real_docs, real_con):
    from pdf_parser_spark.operators.sketches import (
        hist_quantiles,
        hist_quantiles_sql,
        histogram,
        histogram_sql,
    )

    lens = real_docs.select(F.length("text").alias("x"))
    h = histogram(lens, "x", 0.0, 4000.0, n_bins=32)
    got_h = sorted(tuple(r) for r in h.collect())
    want_h = sorted(
        tuple(r)
        for r in real_con.execute(histogram_sql(
            "SELECT length(text) AS x FROM documents", "x", 0.0, 4000.0,
            n_bins=32,
        )).fetchall()
    )
    assert got_h == want_h and len(got_h) > 3
    qs = [0.25, 0.5, 0.9, 0.99]
    got_q = sorted(
        tuple(r) for r in hist_quantiles(h, qs, n_bins=32).collect()
    )
    want_q = sorted(
        tuple(r)
        for r in real_con.execute(hist_quantiles_sql(
            histogram_sql("SELECT length(text) AS x FROM documents",
                          "x", 0.0, 4000.0, n_bins=32),
            qs, n_bins=32,
        )).fetchall()
    )
    assert got_q == want_q
