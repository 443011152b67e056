"""Winnowing fingerprints (operators/winnow.py): the paper's
guarantee (any shared run of >= w+k-1 words is detected in BOTH
documents), density, rightmost-tie robustness, truncated-window
short docs, and the count-first boilerplate cap in the pair join.
Reference: Schleimer, Wilkerson, Aiken — SIGMOD 2003 (public paper);
the reference app has no corpus operators (SURVEY §2.5).
"""

from __future__ import annotations

import duckdb
import pytest

from pdf_parser_spark.operators.winnow import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_fingerprints_sql,
    winnow_pairs,
    winnow_pairs_sql,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_guarantee_shared_run_detected(spark):
    # shared run of exactly w + k - 1 = 8 words, embedded at different
    # offsets inside otherwise-disjoint documents: the paper's
    # guarantee says both docs select at least one fingerprint from
    # inside the run, and those selections intersect.
    shared = _words("common", WINNOW_W + WINNOW_K - 1)
    docs = _mkdocs(
        spark,
        [
            (1, _words("alpha", 11) + " " + shared + " " + _words("omega", 7)),
            (2, _words("beta", 4) + " " + shared + " " + _words("gamma", 13)),
        ],
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {1: set(), 2: set()}
    for r in fps:
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 8-word run must fingerprint-match"


def test_no_match_without_shared_grams(spark):
    docs = _mkdocs(
        spark, [(1, _words("aa", 30)), (2, _words("bb", 30))]
    )
    fps = winnow_fingerprints(docs).collect()
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a and b and not (a & b)


def test_density_and_positions(spark):
    # 200 distinct words -> 196 grams, windows of 4: expected about
    # 2/(w+1) = 40% of positions selected; never more than the
    # window count, never fewer than n_grams/w.
    n_words = 200
    n_grams = n_words - WINNOW_K + 1
    docs = _mkdocs(spark, [(1, _words("w", n_words))])
    fps = winnow_fingerprints(docs).collect()
    n_windows = n_grams - WINNOW_W + 1
    assert n_grams / WINNOW_W <= len(fps) <= n_windows
    assert 0.25 <= len(fps) / n_grams <= 0.55  # ~2/(w+1) = 0.4
    for r in fps:
        assert 1 <= r.pos <= n_grams


def test_short_docs(spark):
    docs = _mkdocs(
        spark,
        [
            (1, _words("x", WINNOW_K - 1)),  # < k words: no grams
            (2, _words("y", WINNOW_K)),      # exactly one gram
            (3, ""),                          # empty
        ],
    )
    fps = winnow_fingerprints(docs).collect()
    assert {r.doc_id for r in fps} == {2}
    assert len(fps) == 1 and fps[0].pos == 1


def test_rightmost_tie_selection(spark):
    # identical text in both docs but shifted by a prefix: a repeated
    # gram produces equal hashes inside one window; robust winnowing
    # (rightmost min) must pick consistent fingerprints so the shared
    # suffix still matches.
    rep = " ".join(["same"] * 20)  # every gram identical -> all ties
    docs = _mkdocs(spark, [(1, rep), (2, "pre1 pre2 pre3 " + rep)])
    fps = winnow_fingerprints(docs).collect()
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a & b


def test_pairs_and_boilerplate_cap(spark):
    shared = _words("copy", 12)
    boiler = _words("footer", 8)  # one window -> ONE fp, same in all
    docs = _mkdocs(
        spark,
        [(1, shared + " " + _words("a", 10) + " " + boiler),
         (2, shared + " " + _words("b", 10) + " " + boiler)]
        + [(i, boiler) for i in range(3, 9)],  # boilerplate-only docs
    )
    fps = winnow_fingerprints(docs)
    pairs = {(r.id_a, r.id_b): r.shared for r in winnow_pairs(fps).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    # uncapped, min_shared=1: the footer fp (selected in all 8 docs —
    # the paper's guarantee, it owns its full window) links everything
    uncapped = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(fps, max_df=1000, min_shared=1).collect()
    }
    assert (3, 4) in uncapped
    # with max_df=4 the df=8 footer fp is dropped count-first: only
    # the genuine copy pair survives
    capped = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(fps, max_df=4, min_shared=1).collect()
    }
    assert capped == {(1, 2)}


def test_duckdb_twin_parity(spark):
    texts = [
        (1, _words("alpha", 23) + " " + _words("shared", 9)),
        (2, _words("shared", 9) + " " + _words("beta", 17)),
        (3, _words("gamma", 4)),   # sub-threshold
        (4, _words("delta", 6)),   # single truncated window
        (5, " ".join(["tie"] * 15)),
    ]
    docs = _mkdocs(spark, texts)
    got = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.execute(
            winnow_fingerprints_sql("documents")
        ).fetchall()
    )
    assert got == want

    gotp = sorted(
        (r.id_a, r.id_b, r.shared)
        for r in winnow_pairs(
            winnow_fingerprints(docs), min_shared=1
        ).collect()
    )
    wantp = sorted(
        (int(a), int(b), int(s))
        for a, b, s in con.execute(
            winnow_pairs_sql(
                winnow_fingerprints_sql("documents"), min_shared=1
            )
        ).fetchall()
    )
    assert gotp == wantp and gotp


def test_bad_params_raise(spark):
    docs = _mkdocs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, w=0)
