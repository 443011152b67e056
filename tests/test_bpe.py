"""BPE training/encoding (operators/bpe.py): merge sequence matches a
pure-Python reference implementation, encoding replays merges, DuckDB
twins are bit-identical."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_sql,
    bpe_train,
    bpe_train_sql,
    word_counts,
)

TEXTS = [
    "low low low low low lower lower newest newest",
    "newest newest newest newest wider wider wider new new",
    "the newest of the new lowly lows",
]


def _ref_bpe(texts, n_merges, min_count=2):
    """Reference implementation (Sennrich alg. 1, greedy leftmost)."""
    wc = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    syms = {w: list(w) + [EOW] for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        pairs = {p: c for p, c in pairs.items() if c >= min_count}
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((step, " ".join(best), "".join(best), pairs[best]))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_merges_match_reference(spark, docs):
    got = [tuple(r) for r in bpe_train(docs, 8, top_words=None)
           .orderBy("step").collect()]
    assert got == _ref_bpe(TEXTS, 8)
    assert len(got) == 8


def test_merge_exhaustion_stops_early(spark, docs):
    # a huge min_count leaves no eligible pair after a few rounds
    got = bpe_train(docs, 50, top_words=None, min_count=9).collect()
    assert len(got) == len(_ref_bpe(TEXTS, 50, min_count=9)) < 50


def test_encode_replays_merges(spark, docs):
    merges = [r.pair for r in bpe_train(docs, 8, top_words=None)
              .orderBy("step").collect()]
    out = spark.createDataFrame([("low lowest newest",)], "t string").select(
        bpe_encode(F.col("t"), merges).alias("e")
    ).collect()[0]["e"]
    # 'low</w>' fully merged after 8 rounds on this corpus; unseen word
    # 'lowest' falls back to subword pieces, every piece preserved
    toks = out.split(" ")
    assert "".join(toks).replace(EOW, "|") == "low|lowest|newest|"
    ref = _ref_bpe(TEXTS, 8)
    assert any(m[2] == "low" + EOW for m in ref) == ("low" + EOW in toks)


def test_back_to_back_merge_in_one_pass(spark):
    # 'a b a b' must merge BOTH occurrences in the round that ranks
    # ('a','b') first — the replacement's trailing space re-seeds the
    # separator (leftmost non-overlapping greedy scan).
    docs = spark.createDataFrame([("abab abab abab",)], "text string")
    merges = [r.pair for r in
              bpe_train(docs, 1, top_words=None).collect()]
    assert merges == ["a b"]
    enc = docs.select(bpe_encode(F.col("text"), merges).alias("e"))
    assert enc.collect()[0]["e"].split(" ")[:3] == ["ab", "ab", EOW]


def test_duckdb_twins_bit_identical(spark, docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in TEXTS])
    for kwargs in ({"top_words": None}, {"top_words": 5},
                   {"top_words": None, "min_count": 9}):
        got = [tuple(r) for r in bpe_train(docs, 6, **kwargs)
               .orderBy("step").collect()]
        want = [tuple(r) for r in
                con.execute(bpe_train_sql("docs", 6, **kwargs)).fetchall()]
        assert got == want, kwargs
    merges = [r.pair for r in bpe_train(docs, 6, top_words=None)
              .orderBy("step").collect()]
    sample = "the lowest new wider lows"
    got = spark.createDataFrame([(sample,)], "t string").select(
        bpe_encode(F.col("t"), merges).alias("e")
    ).collect()[0]["e"]
    want = con.execute(
        f"SELECT {bpe_encode_sql('t', merges)} FROM (SELECT ? AS t)",
        [sample],
    ).fetchone()[0]
    assert got == want


def test_duckdb_twin_back_to_back(spark):
    # the corpus that separates the separator schemes: a single-space
    # twin merges only every second 'a b' in 'abab...' runs
    texts = ["abab ababab abab", "abab zq zq zq"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?)", [(t,) for t in texts])
    got = [tuple(r) for r in bpe_train(docs, 4, top_words=None)
           .orderBy("step").collect()]
    want = [tuple(r) for r in
            con.execute(bpe_train_sql("docs", 4, top_words=None)).fetchall()]
    ref = _ref_bpe(texts, 4)
    assert got == want == ref
    # first merge ('a','b') must count BOTH occurrences inside 'abab'
    assert got[0][1] == "a b" and got[0][3] == sum(
        2 * t.split().count("abab") + 3 * t.split().count("ababab")
        for t in texts
    )
    merges = [m[1] for m in got]
    sample = "ababab ab"
    enc = spark.createDataFrame([(sample,)], "t string").select(
        bpe_encode(F.col("t"), merges).alias("e")
    ).collect()[0]["e"]
    enc_sql = con.execute(
        f"SELECT {bpe_encode_sql('t', merges)} FROM (SELECT ? AS t)",
        [sample],
    ).fetchone()[0]
    assert enc == enc_sql


def test_word_counts(spark, docs):
    wc = {r.word: r.cnt for r in word_counts(docs).collect()}
    assert wc["low"] == 5 and wc["newest"] == 7 and wc["the"] == 2
