"""Cross-engine parity: every textstats Spark expression must compute
bit-identical values to its DuckDB SQL twin on the real testdata —
this is exactly the driver's correctness-gate comparison, run early."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")

pytestmark = pytest.mark.skipif(not os.path.exists(DOCS), reason="no testdata")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return con


def _compare(spark, duck, spark_col, sql_expr, tol=0.0):
    sdf = (
        spark.read.parquet(DOCS)
        .select("doc_id", spark_col.alias("v"))
        .orderBy("doc_id")
        .toPandas()
    )
    ddf = duck.execute(
        f"SELECT doc_id, {sql_expr} AS v FROM documents ORDER BY doc_id"
    ).df()
    assert len(sdf) == len(ddf) > 0
    for (i, a), (_, b) in zip(sdf.iterrows(), ddf.iterrows()):
        assert a.doc_id == b.doc_id
        if tol:
            assert abs(float(a.v) - float(b.v)) <= tol, (a.doc_id, a.v, b.v)
        else:
            assert a.v == b.v, (a.doc_id, a.v, b.v)


def test_ws_token_count(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    _compare(spark, duck, ts.ws_token_count(F.col("text")),
             ts.ws_token_count_sql("text"))


def test_bpe_token_count(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    _compare(spark, duck, ts.bpe_token_count(F.col("text")),
             ts.bpe_token_count_sql("text"))


def test_quality_score(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    _compare(spark, duck, ts.quality_score(F.col("text")),
             ts.quality_score_sql("text"), tol=1e-9)


def test_quality_features(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    feats = ts.quality_features(F.col("text"))
    sqls = ts.quality_features_sql("text")
    for name in feats:
        tol = 1e-9 if "ratio" in name or "avg" in name else 0.0
        _compare(spark, duck, feats[name].cast("double"),
                 f"CAST({sqls[name]} AS DOUBLE)", tol=tol)


def test_lang_id(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    _compare(spark, duck, ts.lang_id(F.col("text")), ts.lang_id_sql("text"))


def test_md5_fingerprint(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    _compare(spark, duck, ts.md5_fingerprint(F.col("text")),
             ts.md5_fingerprint_sql("text"))


def test_rolling_fingerprint(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    _compare(spark, duck, ts.rolling_fingerprint(F.col("text")),
             ts.rolling_fingerprint_sql("text"))


def test_rolling_fingerprint_is_rabin_karp(spark):
    from pdf_parser_spark.functions.textstats import (
        ROLL_BASE, ROLL_MOD, rolling_fingerprint,
    )

    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(rolling_fingerprint(F.col("s"))).first()[0]
    exp = 0
    for ch in "abc":
        exp = (exp * ROLL_BASE + ord(ch)) % ROLL_MOD
    assert got == exp


def test_pii_counts_and_redact(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    s = ("contact a@b.com or c.d@e.org, server 10.2.3.4, ssn 123-45-6789 "
         "not-a-mail @ nowhere, version 1.2 only")
    df = spark.createDataFrame([(s,)], "text string")
    c = ts.pii_counts(F.col("text"))
    row = df.select(
        c["emails"].alias("e"), c["ipv4s"].alias("i"),
        c["ssn_like"].alias("s"),
        ts.pii_redact(F.col("text")).alias("red"),
    ).first()
    assert (row.e, row.i, row.s) == (2, 1, 1)
    assert row.red.count("<PII>") == 4
    assert "@" in row.red and "a@b.com" not in row.red  # lone @ kept
    # DuckDB twins compute the identical values on the same string
    d = duck.execute(
        f"SELECT {ts.pii_counts_sql('t')['emails']} AS e, "
        f"{ts.pii_counts_sql('t')['ipv4s']} AS i, "
        f"{ts.pii_counts_sql('t')['ssn_like']} AS s, "
        f"{ts.pii_redact_sql('t')} AS red FROM (SELECT ? AS t)", [s]
    ).fetchone()
    assert d == (row.e, row.i, row.s, row.red)


def test_gopher_gate_rules_and_twin(spark, duck):
    from pdf_parser_spark.functions import textstats as ts

    healthy = ("the crawl data must be clean to train and that we have "
               "built with care " * 4)
    cases = [
        (healthy, ""),
        ("too short text", "n_words"),
        ("a " * 60, "word_len"),
        (healthy + " #" * 10, "symbols"),
        ("\n".join(["- " + healthy[:75]] * 10), "bullets"),
        ("\n".join([healthy + "...", healthy, healthy + "...", healthy]),
         "ellipsis"),
        (healthy + " 12345" * 20, "alpha_words"),
        ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
         "eiusmod tempor " * 5, "stopwords"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    g = ts.gopher_gate(F.col("t"))
    got = [r.reason for r in
           df.select(g["reason"].alias("reason")).collect()]
    assert got == [want for _, want in cases]
    # keep iff reason == ''
    keeps = [r.keep for r in df.select(g["keep"].alias("keep")).collect()]
    assert keeps == [w == "" for _, w in cases]
    # the DuckDB twin computes the identical verdicts
    gq = ts.gopher_gate_sql("t")
    for t, want in cases:
        d = duck.execute(
            f"SELECT {gq['reason']} AS r FROM (SELECT ? AS t)", [t]
        ).fetchone()[0]
        assert d == want, (t[:40], d, want)
