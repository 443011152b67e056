"""Deterministic sampling operators (operators/sampling.py): stable
hash fractions, exact stratified top-n without full-stratum sorts."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_parser_spark.operators.sampling import (
    HASH_SPACE,
    hash_draw,
    hash_sample,
    keep_threshold,
    stratified_sample,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(6000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
        F.md5(F.col("id").cast("string")).alias("text"),
    ).persist()


def test_hash_sample_rate_and_determinism(corpus):
    a = hash_sample(corpus, 0.25, salt="s1")
    b = hash_sample(corpus, 0.25, salt="s1")
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # pure function of (key, salt)
    assert 0.20 < len(ids_a) / 6000 < 0.30
    # different salt = independent draw, same expected rate
    ids_c = {r.doc_id for r in
             hash_sample(corpus, 0.25, salt="s2").select("doc_id").collect()}
    assert ids_c != ids_a
    assert 0.20 < len(ids_c) / 6000 < 0.30
    # nesting: a 0.1 sample is a subset of the 0.25 sample (same salt)
    ids_d = {r.doc_id for r in
             hash_sample(corpus, 0.1, salt="s1").select("doc_id").collect()}
    assert ids_d <= ids_a


def test_keep_threshold_bounds():
    assert keep_threshold(0.0) == 0
    assert keep_threshold(1.0) == HASH_SPACE
    with pytest.raises(ValueError):
        keep_threshold(1.5)


def _ground_truth(corpus, n):
    """The naive semantics: full-table window top-n per key."""
    w = Window.partitionBy("lang").orderBy(
        hash_draw(F.col("doc_id"), "q"), F.col("doc_id"))
    return {
        (r.lang, r.doc_id)
        for r in corpus.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n).select("lang", "doc_id").collect()
    }


def test_stratified_exact_vs_plain_window(corpus):
    got = {
        (r.lang, r.doc_id)
        for r in stratified_sample(corpus, 40, key_col="lang", salt="q")
        .select("lang", "doc_id").collect()
    }
    assert got == _ground_truth(corpus, 40)
    assert len(got) == 5 * 40


def test_stratified_fallback_path_still_exact(corpus):
    # oversample so small the hash threshold keeps ~1 row/key: every
    # key goes deficient and falls back to its full stratum — the
    # result must STILL equal the plain-window truth
    got = {
        (r.lang, r.doc_id)
        for r in stratified_sample(
            corpus, 40, key_col="lang", salt="q", oversample=0.001)
        .select("lang", "doc_id").collect()
    }
    assert got == _ground_truth(corpus, 40)


def test_stratified_small_strata_kept_whole(spark):
    tiny = spark.range(7).select(
        F.col("id").alias("doc_id"), F.lit("xx").alias("lang"))
    out = stratified_sample(tiny, 40, key_col="lang")
    assert out.count() == 7


def test_stratified_null_key_is_a_stratum(spark):
    """NULL key_col rows form a stratum of their own, exactly as the
    plain window (and the DuckDB twin) treats them — the threshold
    join is null-safe, so they are neither dropped nor merged."""
    corpus = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 != 4, (F.col("id") % 5).cast("string"))
        .alias("lang"),  # every 5th row: lang IS NULL (600 rows)
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    got = {
        (r.lang, r.doc_id)
        for r in stratified_sample(corpus, 40, key_col="lang", salt="q")
        .select("lang", "doc_id").collect()
    }
    assert got == _ground_truth(corpus, 40)
    assert sum(1 for lang, _ in got if lang is None) == 40

    # fallback path (every key deficient, incl. the NULL stratum)
    got_fb = {
        (r.lang, r.doc_id)
        for r in stratified_sample(
            corpus, 40, key_col="lang", salt="q", oversample=0.001)
        .select("lang", "doc_id").collect()
    }
    assert got_fb == got

    # large-key branch (> 256 deficient keys exercises the broadcast
    # join dedup instead of the literal IN-filter) with NULLs present
    wide = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 300 != 299,
               (F.col("id") % 300).cast("string")).alias("lang"),
    )
    out = stratified_sample(wide, 3, key_col="lang", salt="q",
                            oversample=0.001)
    w = Window.partitionBy("lang").orderBy(
        hash_draw(F.col("doc_id"), "q"), F.col("doc_id"))
    want = {
        (r.lang, r.doc_id)
        for r in wide.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3).select("lang", "doc_id").collect()
    }
    assert {(r.lang, r.doc_id) for r in out.collect()} == want


def _budget_truth(df, budget, salt="b"):
    """The naive semantics: global cumsum over (draw, id) order."""
    w = Window.orderBy(hash_draw(F.col("doc_id"), salt), F.col("doc_id")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return {
        r.doc_id
        for r in df.withColumn("c", F.sum("w").over(w))
        .where(F.col("c") <= budget).collect()
    }


@pytest.fixture(scope="module")
def weighted(spark):
    return spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).alias("w"),  # total = 5000*49.x ~ 245k
    ).persist()


def test_token_budget_exact_vs_global_cumsum(weighted):
    for budget in (0, 1, 50_000, 120_000, 10**9):
        got = {
            r.doc_id
            for r in token_budget_sample(
                weighted, budget, weight_col="w", salt="b").collect()
        }
        assert got == _budget_truth(weighted, budget), budget
    # full-budget case keeps everything
    assert len(_budget_truth(weighted, 10**9)) == 5000


def test_token_budget_boundary_is_exact(weighted):
    """The kept sum is the maximal prefix sum <= budget: adding the
    next doc in draw order would exceed it."""
    budget = 77_777
    kept = token_budget_sample(weighted, budget, weight_col="w", salt="b")
    total = kept.agg(F.sum("w")).first()[0]
    assert total <= budget
    n_kept = kept.count()
    truth_plus = _budget_truth(weighted, budget + 97)  # one more max-w doc
    assert total + 1 > budget - 97  # within one doc weight of the budget
    assert n_kept <= len(truth_plus)


def test_token_budget_levels_and_buckets_agree(weighted):
    base = {
        r.doc_id
        for r in token_budget_sample(
            weighted, 60_000, weight_col="w", salt="b").collect()
    }
    for kwargs in ({"levels": 1}, {"n_buckets": 64, "levels": 2},
                   {"n_buckets": 16, "levels": 3}):
        got = {
            r.doc_id
            for r in token_budget_sample(
                weighted, 60_000, weight_col="w", salt="b",
                **kwargs).collect()
        }
        assert got == base, kwargs


def test_token_budget_rejects_bad_args(weighted):
    with pytest.raises(ValueError):
        token_budget_sample(weighted, -1, weight_col="w")
    with pytest.raises(ValueError, match="divide"):
        token_budget_sample(weighted, 10, weight_col="w", n_buckets=1000)


def test_stratified_rejects_bad_args(corpus):
    with pytest.raises(ValueError):
        stratified_sample(corpus, 0)
    with pytest.raises(ValueError, match="strata"):
        stratified_sample(
            corpus, 2, key_col="doc_id", keys_broadcast_limit=10)


def test_dataset_split_partition_and_stability(corpus):
    from pdf_parser_spark.operators.sampling import dataset_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = dataset_split(corpus, fr).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert sum(counts.values()) == 6000  # exact partition, no row lost
    assert 0.75 < counts["train"] / 6000 < 0.85
    assert 0.07 < counts["val"] / 6000 < 0.13
    # assignment is a pure function of (key, salt): stable across runs
    a = dataset_split(corpus, fr).select("doc_id", "split").collect()
    b = dataset_split(corpus, fr).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and stable under corpus growth: a subset sees identical labels
    sub = {
        (r.doc_id, r.split)
        for r in dataset_split(corpus.limit(1000), fr)
        .select("doc_id", "split")
        .collect()
    }
    assert sub <= {(r.doc_id, r.split) for r in a}


def test_dataset_split_rejects_bad_fractions(corpus):
    from pdf_parser_spark.operators.sampling import dataset_split

    with pytest.raises(ValueError, match="sum to 1"):
        dataset_split(corpus, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="positive"):
        dataset_split(corpus, {"train": -0.1, "val": 1.1})
    with pytest.raises(ValueError, match="non-empty"):
        dataset_split(corpus, {})


def test_dataset_split_duckdb_twin(corpus):
    import duckdb

    from pdf_parser_spark.operators.sampling import (
        dataset_split,
        dataset_split_sql,
    )

    fr = {"train": 0.9, "test": 0.1}
    rows = [(r.doc_id, r.split)
            for r in dataset_split(corpus, fr).select("doc_id", "split")
            .collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(6000)])
    oracle = con.execute(
        dataset_split_sql("t", fr, columns="doc_id")).fetchall()
    assert sorted(oracle) == sorted(rows)


# ------------------------------------------------------- weighted sample

def test_weighted_sample_contract(spark):
    from pdf_parser_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 10.0), (4, None), (5, 0.0), (6, -2.0)],
        "doc_id long, w double",
    )
    rows = weighted_sample(df, 2, "w", salt="t").collect()
    assert len(rows) == 2
    ids = {r.doc_id for r in rows}
    assert ids <= {1, 2, 3}          # null/zero/negative weights excluded
    # deterministic under rerun
    again = {r.doc_id for r in weighted_sample(df, 2, "w", salt="t").collect()}
    assert ids == again


def test_weighted_sample_weight_proportional(spark):
    from pdf_parser_spark.operators.sampling import weighted_sample

    # one heavy item vs 7 light ones: across salts the heavy item must
    # be picked far more often (A-ES inclusion ∝ weight)
    df = spark.createDataFrame(
        [(0, 50.0)] + [(i, 1.0) for i in range(1, 8)],
        "doc_id long, w double",
    )
    wins = sum(
        any(r.doc_id == 0 for r in weighted_sample(df, 1, "w", salt=f"s{k}").collect())
        for k in range(12)
    )
    assert wins >= 9     # E[wins] ≈ 12 * 50/57 ≈ 10.5


def test_weighted_sample_twin(spark):
    import duckdb

    from pdf_parser_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = docs.selectExpr("doc_id", "length(text) + 1 AS wlen")
    got = sorted(tuple(r) for r in weighted_sample(d, 30, "wlen").collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(weighted_sample_sql(
        "(SELECT doc_id, length(text) + 1 AS wlen FROM documents)",
        30, "wlen",
    )).fetchall())
    assert got == want and len(got) == 30


# ----------------------------------------------------- temperature mix

def test_temperature_mix_flattens_head(spark):
    from pdf_parser_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    before = {r.lang: r.c for r in
              docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    kept = temperature_mix(docs, alpha=0.5)
    after = {r.lang: r.c for r in
             kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # proportions follow sqrt(count): the head language's share shrinks
    import math
    tot_b, tot_a = sum(before.values()), sum(after.values())
    head = max(before, key=before.get)
    assert after[head] / tot_a < before[head] / tot_b
    # every language keeps roughly its sqrt-proportional target
    wr = {s: math.sqrt(c) for s, c in before.items()}
    t = min(before[s] / wr[s] for s in wr)
    for s, c in before.items():
        target = wr[s] * t
        assert abs(after[s] - target) <= max(6, 0.12 * target)
    # the binding (smallest-rate... largest-keep) stratum keeps ~all
    binding = min(before, key=lambda s: before[s] / wr[s])
    assert after[binding] >= 0.95 * before[binding]


def test_temperature_mix_alpha1_keeps_everything(spark):
    from pdf_parser_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # alpha=1 → target proportions == current proportions → rate 1
    assert temperature_mix(docs, alpha=1.0).count() == docs.count()


def test_temperature_mix_deterministic_and_bad_alpha(spark):
    import pytest

    from pdf_parser_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id for r in temperature_mix(docs).select("doc_id").collect()}
    b = {r.doc_id for r in temperature_mix(docs).select("doc_id").collect()}
    assert a == b
    with pytest.raises(ValueError):
        temperature_mix(docs, alpha=0.0)


def test_temperature_mix_twin(spark):
    import duckdb

    from pdf_parser_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        (r.doc_id, r.lang)
        for r in temperature_mix(docs).select("doc_id", "lang").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(con.execute(temperature_mix_sql(
        "documents", columns="d.doc_id, d.lang"
    )).fetchall())
    assert got == want and 0 < len(got) < docs.count()


def test_temperature_mix_null_key_is_a_stratum(spark):
    import duckdb

    from pdf_parser_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    withnull = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang",
    )
    kept = temperature_mix(withnull).select("doc_id", "lang").collect()
    # NULL-key rows survive as their own stratum (the null-safe join)
    assert any(r.lang is None for r in kept)
    got = sorted((r.doc_id, r.lang) for r in kept)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(con.execute(temperature_mix_sql(
        "(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL"
        " ELSE lang END AS lang FROM documents)",
        columns="d.doc_id, d.lang",
    )).fetchall())
    assert got == want
