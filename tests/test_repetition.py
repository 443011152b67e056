"""Gopher repetition suite, C4 line cleaner, corpus line dedup.

Three verification layers: an independent pure-Python reference
implementation (so both engines can't share a bug), Spark-vs-DuckDB
parity on the constructed rule-firing fixtures plus edge cases, and
behavioral assertions (which rule fires, what survives a rewrite)."""

import re
import sys
from collections import Counter
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark.functions import textstats as ts
from pdf_parser_spark.operators import dedup as dd


# ------------------------------------------- pure-Python reference


def _ref_signals(text: str) -> dict:
    def elems(pat):
        return [s.strip() for s in re.split(pat, text) if s.strip()]

    def dup_fracs(els):
        n = len(els)
        if n == 0:
            return 0.0, 0.0
        c = Counter(els)
        dup = sum(v - 1 for v in c.values())
        tot = sum(len(e) for e in els)
        dupc = sum((v - 1) * len(e) for e, v in c.items())
        return dup / n, (dupc / tot if tot else 0.0)

    out = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = dup_fracs(
        elems(r"\n")
    )
    out["dup_para_frac"], out["dup_para_char_frac"] = dup_fracs(
        elems(r"\n{2,}")
    )
    words = text.strip().split() if text.strip() else []

    def shingles(n):
        return [
            " ".join(words[i:i + n])
            for i in range(len(words) - n + 1)
        ]

    for n in (2, 3, 4):
        sh = shingles(n)
        c = Counter(sh)
        key = f"top_{n}gram_char_frac"
        if not sh or max(c.values()) < 2:
            out[key] = 0.0
            continue
        maxc = max(c.values())
        maxl = max(len(g) for g, v in c.items() if v == maxc)
        out[key] = maxc * maxl / len(text)
    word_chars = sum(len(w) for w in words)
    for n in range(5, 11):
        sh = shingles(n)
        c = Counter(sh)
        covered = set()
        for i, g in enumerate(sh):
            if c[g] >= 2:
                covered.update(range(i, i + n))
        num = sum(len(words[p]) for p in covered)
        out[f"dup_{n}gram_char_frac"] = (
            num / word_chars if word_chars else 0.0
        )
    return out


def _fixture_texts():
    import __spark_entry__ as entry

    return entry._rep_case_texts()


EDGES = [
    "",
    "   ",
    "word",
    "a\n\n\n\nb\n\nc c c c c c",
    "x " * 4,  # 4 words, no 5-grams
]


def test_signals_match_python_reference(spark):
    texts = _fixture_texts() + EDGES
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r for r in ts.repetition_signals(df).collect()
    }
    for i, t in enumerate(texts):
        ref = _ref_signals(t)
        for k, v in ref.items():
            got = rows[i][k]
            assert abs(got - v) < 1e-12, (i, k, got, v)


def test_gate_reasons_fire_every_rule(spark):
    texts = _fixture_texts()
    expected = [""] + [n for n, _ in ts.GOPHER_REPETITION_RULES]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r for r in ts.repetition_signals(df).collect()
    }
    for i in range(14):
        assert rows[i]["reason"] == expected[i], (i, rows[i])
        assert rows[i]["keep"] == (expected[i] == "")


def test_signals_duckdb_parity(spark):
    texts = _fixture_texts() + EDGES
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in ts.repetition_signals(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
    )
    res = con.sql(ts.repetition_signals_sql("docs"))
    cols = [d[0] for d in res.description]
    for row in res.fetchall():
        srow = got[row[0]]
        for c, v in zip(cols, row):
            assert srow[c] == v, (row[0], c, srow[c], v)


# --------------------------------------------------------- C4 clean


def test_c4_clean_rules(spark):
    good = "This sentence has clearly more than five words."
    texts = [
        "\n".join([good] * 6),
        "\n".join([good] * 5 + ["Enable JavaScript to view this."]),
        "\n".join([good] * 2 + ["no terminal punct", "Nav"]),
        "\n".join([good] * 6 + ["has lorem ipsum in it."]),
        "\n".join([good] * 6) + "\ncode { brace }",
        "tiny.\nalso tiny.",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    c = ts.c4_clean(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select("doc_id", c.alias("c")).collect()
    }
    assert rows[0]["c"]["keep"] and rows[0]["c"]["n_kept_lines"] == 6
    # javascript line dropped but page survives
    assert rows[1]["c"]["keep"] and rows[1]["c"]["n_kept_lines"] == 5
    assert "JavaScript" not in rows[1]["c"]["clean_text"]
    assert rows[2]["c"]["reason"] == "too_few_lines"
    assert rows[3]["c"]["reason"] == "lorem_ipsum"
    assert rows[4]["c"]["reason"] == "curly_brace"
    assert rows[5]["c"]["reason"] == "too_few_lines"
    assert rows[5]["c"]["clean_text"] == ""


# ------------------------------------------------------ line dedup


BOILER = "This website uses cookies to improve your experience"


def test_dedup_lines_first_occurrence_wins(spark):
    docs = [
        (0, BOILER + "\nunique body line of document zero here", "a"),
        (1, "unique body line of document one here\n" + BOILER, "b"),
        (2, BOILER, "c"),
        (3, "ok\nhi", "d"),  # below min_len: untouched
        (4, BOILER + "  ", "e"),  # trims to the same key
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, extra string"
    )
    rows = {
        r["doc_id"]: r for r in dd.dedup_lines(df).collect()
    }
    assert rows[0]["text"].startswith(BOILER)  # first occurrence kept
    assert rows[0]["n_dropped"] == 0
    assert BOILER not in rows[1]["text"]
    assert rows[1]["n_dropped"] == 1
    assert rows[2]["text"] == ""  # whole doc was the duplicate line
    assert rows[3]["text"] == "ok\nhi"  # short lines never candidates
    assert rows[4]["text"] == ""  # trimmed key matches
    assert rows[4]["n_dropped"] == 1
    assert rows[2]["extra"] == "c"  # passthrough columns survive


def test_dedup_lines_preserves_remaining_order(spark):
    docs = [
        (0, "alpha line kept number one\nbeta line kept number two"),
        (1, "beta line kept number two\ngamma stays in position three"
            "\nalpha line kept number one"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r["doc_id"]: r for r in dd.dedup_lines(df).collect()
    }
    assert rows[1]["text"] == "gamma stays in position three"
    assert rows[1]["n_dropped"] == 2
