"""CCNet-style normalization (functions/normalize.py): every rule
fires, the fold is idempotent, and the DuckDB twin is byte-identical
on unicode-heavy input."""

import duckdb
from pyspark.sql import functions as F

from pdf_parser_spark.functions import normalize as nz

SAMPLES = [
    "ÀéÎ “Café” — 2024… déjà-vu",
    "«Słub» ‘ńo’   42\tlines\nhere",
    "plain ascii stays plain ascii",
    "MIXED Case ÜÑÎÇØDÉ 999",
    "",
]


def _spark_norm(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [
        r.n
        for r in df.select(
            nz.normalize_text(F.col("t"), **kw).alias("n")
        ).collect()
    ]


def test_rules_fire(spark):
    out = _spark_norm(spark, SAMPLES)
    assert out[0] == 'aei "cafe" - 0000. deja-vu'
    assert out[1] == '"slub" \'no\' 00 lines here'
    assert out[2] == "plain ascii stays plain ascii"
    assert out[3] == "mixed case unicode 000"
    assert out[4] == ""


def test_idempotent(spark):
    once = _spark_norm(spark, SAMPLES)
    twice = _spark_norm(spark, once)
    assert once == twice


def test_duckdb_twin_byte_identical(spark):
    sql = nz.normalize_text_sql("t")
    con = duckdb.connect()
    oracle = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        for t in SAMPLES
    ]
    assert oracle == _spark_norm(spark, SAMPLES)


def test_flags_disable_rules(spark):
    (out,) = _spark_norm(spark, ["Ab 12"], lower=False, digits=False)
    assert out == "Ab 12"
