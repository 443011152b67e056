# -*- coding: utf-8 -*-
"""Mojibake repair (functions/mojibake.py): the generated table fixes
the full Latin-1/cp1252 repertoire, clean text is never altered, the
native codec path agrees with the portable oracle path, and the
DuckDB twin is byte-identical."""

import duckdb
from pyspark.sql import functions as F

from pdf_parser_spark.functions import mojibake as mj


def _moji(s: str) -> str:
    """What a cp1252 consumer shows for UTF-8 bytes of ``s``."""
    return mj._sloppy_cp1252(s.encode("utf-8"))


CLEAN = [
    "plain ascii, untouched.",
    "déjà vu — legitimate accents stay",   # é followed by ASCII: not a stream
    "日本語テキスト",                        # non-cp1252: untouched
    "",
]
BROKEN = [
    "CafÃ© â€” naÃ¯ve",
    _moji("‘curly’ “quotes” …and€ down–to—business"),
    _moji("àéîõü ÀÉÎÕÜ ñç ß ¡¿ «»"),
]
FIXED = [
    "Café — naïve",
    "‘curly’ “quotes” …and€ down–to—business",
    "àéîõü ÀÉÎÕÜ ñç ß ¡¿ «»",
]


def _run(spark, texts, fn):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r.o for r in df.select(fn(F.col("t")).alias("o")).collect()]


def test_portable_fixes_and_preserves(spark):
    assert _run(spark, BROKEN, mj.fix_mojibake_portable) == FIXED
    assert _run(spark, CLEAN, mj.fix_mojibake_portable) == CLEAN


def test_native_fixes_and_preserves(spark):
    assert _run(spark, BROKEN, mj.fix_mojibake) == FIXED
    assert _run(spark, CLEAN, mj.fix_mojibake) == CLEAN


def test_native_agrees_with_portable_per_char(spark):
    """Every covered codepoint round-trips identically on both paths
    when embedded in an ASCII sentence."""
    samples = [f"x {_moji(c)} y" for _, c in mj.MOJIBAKE_PAIRS]
    assert _run(spark, samples, mj.fix_mojibake) == _run(
        spark, samples, mj.fix_mojibake_portable
    )
    assert _run(spark, samples, mj.fix_mojibake_portable) == [
        f"x {c} y" for _, c in mj.MOJIBAKE_PAIRS
    ]


def test_double_mojibake_peels_one_layer_per_pass(spark):
    double = _moji(_moji("é"))
    (once,) = _run(spark, [double], mj.fix_mojibake_portable)
    assert once == _moji("é")
    (twice,) = _run(spark, [once], mj.fix_mojibake_portable)
    assert twice == "é"


def test_truncated_sequence_untouched_by_native(spark):
    """A dangling lead byte makes the stream invalid: the native guard
    must keep the row verbatim rather than risk a strict-codec error."""
    broken_tail = "CafÃ© Ã"
    assert _run(spark, [broken_tail], mj.fix_mojibake) == [broken_tail]


def test_duckdb_twin_byte_identical(spark):
    sql = mj.fix_mojibake_sql("t")
    con = duckdb.connect()
    oracle = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        for t in BROKEN + CLEAN
    ]
    assert oracle == _run(spark, BROKEN + CLEAN, mj.fix_mojibake_portable)
