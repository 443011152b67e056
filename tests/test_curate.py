"""End-to-end curation job (jobs/curate.py): fate tagging order,
dedup drop-lists, metrics, PII redaction, deterministic sampling."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.jobs.curate import curate_documents, run_curate_job

_BANK = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu amber birch cedar dune "
    "ember flint grove harbor inlet juniper knoll lagoon meadow nectar"
).split()


def _sent(seed: int, n: int = 20) -> str:
    # n distinct words, no repeated bigrams, all-alpha: passes the gate
    return " ".join(_BANK[(seed * 7 + i) % len(_BANK)] for i in range(n))


ROWS = [
    ("http://e.test/err", _sent(1), "boom"),                 # error
    ("http://q.test/short", "tiny words here", None),        # quality
    ("http://u.test/a", _sent(2), None),                     # kept (url keeper)
    ("http://u.test/a?utm_source=x", _sent(3), None),        # url_dup
    ("http://x.test/1", _sent(4), None),                     # exact keeper/dup
    ("http://x.test/2", _sent(4), None),
    ("http://n.test/1", _sent(5, 30), None),                 # near keeper/dup
    ("http://n.test/2", _sent(5, 30) + " coda", None),
    ("http://k.test/solo", _sent(9), None),                  # kept
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "url string, text string, error string")


def test_fate_tags_and_stage_order(spark):
    tagged = curate_documents(_docs(spark))
    fates = {r.url: r.fate for r in tagged.collect()}
    assert fates["http://e.test/err"] == "error"
    assert fates["http://q.test/short"] == "quality:too_few_words"
    assert fates["http://u.test/a"] == "kept"  # bytewise-min raw url
    assert fates["http://u.test/a?utm_source=x"] == "url_dup"
    assert sorted(
        [fates["http://x.test/1"], fates["http://x.test/2"]]
    ) == ["exact_dup", "kept"]
    assert sorted(
        [fates["http://n.test/1"], fates["http://n.test/2"]]
    ) == ["kept", "near_dup"]
    assert fates["http://k.test/solo"] == "kept"


def test_sampling_and_pii_are_fate_aware(spark):
    docs = _docs(spark).withColumn(
        "text", F.concat("text", F.lit(" mail me at a@b.example now"))
    )
    # rate 0: every would-be-kept doc is tagged sampled_out, dropped
    # docs keep their original fate (the audit stays truthful)
    t = curate_documents(docs, sample_rate=0.0)
    fates = {r.fate for r in t.collect()}
    assert "kept" not in fates and "sampled_out" in fates
    assert "error" in fates
    # redaction touches ONLY kept rows
    t = curate_documents(docs, redact_pii=True)
    for r in t.collect():
        if r.fate == "kept":
            assert "a@b.example" not in r.text and "<PII>" in r.text
        else:
            assert "<PII>" not in r.text


def test_run_curate_job_writes_and_resumes_counts(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "out")
    _docs(spark).write.parquet(src)
    res = run_curate_job(spark, src, out, run_id="r1")
    assert res["fates"] == {
        "error": 1, "quality:too_few_words": 1, "url_dup": 1,
        "exact_dup": 1, "near_dup": 1, "kept": 4,
    }
    curated = spark.read.parquet(f"{out}/curated.parquet")
    assert curated.count() == 4 and "fate" not in curated.columns
    m = spark.read.parquet(f"{out}/curation_metrics.parquet")
    got = {(r.run_id, r.fate): r.n_docs for r in m.collect()}
    assert got[("r1", "kept")] == 4 and got[("r1", "near_dup")] == 1


def test_near_dedup_optional(spark):
    t = curate_documents(_docs(spark), near_dedup=False)
    fates = [r.fate for r in t.collect()]
    assert "near_dup" not in fates and fates.count("kept") == 5


# ------------------------------------------- incremental (vs history)


def _isent(seed: int, n: int = 20, suffix: str = "") -> str:
    """n all-alpha words, every word carrying the seed code — shingle
    sets of different seeds are DISJOINT (unlike _sent, whose seeds
    are overlapping windows of ONE cyclic vocabulary: any two _sent
    windows share long consecutive runs, which the near-dedup operator
    correctly flags — here near-dups fire only where intended)."""
    code = chr(97 + seed % 25) + chr(97 + seed // 25)
    return " ".join(f"word{code}{chr(97 + j)}" for j in range(n)) + suffix


HIST_ROWS = [
    ("http://h.test/a", _isent(2), None),           # canon-collides w/ new
    ("http://corp.test/x", _isent(4), None),        # exact text of x1/x2
    ("http://corp.test/n", _isent(5, 30), None),    # near text of n1
]

NEW_ROWS = [
    ("http://e.test/err", _isent(1), "boom"),             # error
    ("http://q.test/short", "tiny words here", None),     # quality
    ("http://h.test/a?utm_source=x", _isent(11), None),   # url_dup_hist
    ("http://h.test/a#frag", _isent(12), None),           # url_dup_hist (both!)
    ("http://u.test/b", _isent(13), None),                # kept (url keeper)
    ("http://u.test/b?utm_source=y", _isent(13), None),   # url_dup (in batch)
    ("http://x.test/1", _isent(4), None),                 # exact_dup_hist
    ("http://x.test/2", _isent(4), None),                 # exact_dup_hist (both!)
    ("http://y.test/1", _isent(14), None),                # exact keeper/dup pair
    ("http://y.test/2", _isent(14), None),
    ("http://n.test/1", _isent(5, 30, " coda"), None),    # near_dup_hist
    ("http://m.test/1", _isent(15, 30), None),            # near keeper/dup pair
    ("http://m.test/2", _isent(15, 30, " coda"), None),
    ("http://k.test/solo", _isent(9), None),              # kept
]


def test_incremental_fates_and_history_precedence(spark):
    from pdf_parser_spark.jobs.curate import curate_documents_incremental

    hist = spark.createDataFrame(
        HIST_ROWS, "url string, text string, error string")
    new = spark.createDataFrame(
        NEW_ROWS, "url string, text string, error string")
    tagged = curate_documents_incremental(new, hist)
    fates = {r.url: r.fate for r in tagged.collect()}
    assert fates["http://e.test/err"] == "error"
    assert fates["http://q.test/short"] == "quality:too_few_words"
    # the history doc is the keeper: BOTH new variants drop, and the
    # hist fate outranks the within-batch window (neither is url_dup)
    assert fates["http://h.test/a?utm_source=x"] == "url_dup_hist"
    assert fates["http://h.test/a#frag"] == "url_dup_hist"
    assert fates["http://u.test/b"] == "kept"
    assert fates["http://u.test/b?utm_source=y"] == "url_dup"
    # same: both exact copies of a corpus text drop as _hist, while a
    # purely-in-batch exact pair keeps its bytewise-min-id member
    assert fates["http://x.test/1"] == "exact_dup_hist"
    assert fates["http://x.test/2"] == "exact_dup_hist"
    assert sorted(
        [fates["http://y.test/1"], fates["http://y.test/2"]]
    ) == ["exact_dup", "kept"]
    assert fates["http://n.test/1"] == "near_dup_hist"
    assert sorted(
        [fates["http://m.test/1"], fates["http://m.test/2"]]
    ) == ["kept", "near_dup"]
    assert fates["http://k.test/solo"] == "kept"


def test_incremental_accepts_materialized_band_index(spark, tmp_path):
    """The history band probe composes with jobs/dedup_index.py: the
    materialized (doc_id, band_key) relation replaces the history
    signature recompute and yields identical fates."""
    from pdf_parser_spark.jobs.curate import curate_documents_incremental
    from pdf_parser_spark.jobs.dedup_index import (
        build_dedup_index,
        load_dedup_index,
    )

    hist = spark.createDataFrame(
        HIST_ROWS, "url string, text string, error string"
    ).withColumn("doc_id", F.md5("url"))
    new = spark.createDataFrame(
        NEW_ROWS, "url string, text string, error string")
    idx_path = str(tmp_path / "hist_index.parquet")
    build_dedup_index(hist, idx_path)

    want = {
        r.url: r.fate
        for r in curate_documents_incremental(new, hist).collect()
    }
    got = {
        r.url: r.fate
        for r in curate_documents_incremental(
            new, hist,
            history_band_index=load_dedup_index(spark, idx_path),
        ).collect()
    }
    assert got == want
    assert "near_dup_hist" in got.values()


def test_run_curate_job_incremental_append_loop(spark, tmp_path):
    """The daily loop: curate the increment against the existing
    corpus, append the kept rows — the corpus grows only by novel
    documents."""
    from pdf_parser_spark.sources import read_table

    hist_ref = str(tmp_path / "corpus.parquet")
    new_ref = str(tmp_path / "increment.parquet")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        HIST_ROWS, "url string, text string, error string"
    ).write.parquet(hist_ref)
    spark.createDataFrame(
        NEW_ROWS, "url string, text string, error string"
    ).write.parquet(new_ref)

    res = run_curate_job(spark, new_ref, out, run_id="inc1",
                         history_ref=hist_ref)
    assert res["fates"] == {
        "error": 1, "quality:too_few_words": 1,
        "url_dup_hist": 2, "url_dup": 1,
        "exact_dup_hist": 2, "exact_dup": 1,
        "near_dup_hist": 1, "near_dup": 1,
        "kept": 4,
    }
    kept = read_table(spark, f"{out}/curated.parquet")
    assert kept.count() == 4


def test_run_curate_job_daily_loop_self_history(spark, tmp_path):
    """The documented daily loop reads history from the job's OWN
    curated output and appends to it — a read-modify-write cycle on
    one table. The fates must be computed BEFORE the append grows the
    table (a lazily-cached plan recomputed after the append re-fates
    the freshly appended rows as history dups)."""
    from pdf_parser_spark.sources import read_table

    out = str(tmp_path / "out")
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    spark.createDataFrame(
        [("http://d1-a.test/", _isent(30), None),
         ("http://d1-b.test/", _isent(31), None)],
        "url string, text string, error string").write.parquet(day1)
    spark.createDataFrame(
        [("http://d2-a.test/", _isent(30), None),   # exact dup of day1
         ("http://d2-b.test/", _isent(32), None)],  # novel
        "url string, text string, error string").write.parquet(day2)

    run_curate_job(spark, day1, out, run_id="d1")
    corpus_ref = f"{out}/curated.parquet"
    res = run_curate_job(spark, day2, out, run_id="d2",
                         history_ref=corpus_ref)
    assert res["fates"] == {"exact_dup_hist": 1, "kept": 1}
    corpus = read_table(spark, corpus_ref)
    assert corpus.count() == 3
    assert corpus.select("text").distinct().count() == 3


def test_incremental_disjoint_history_changes_nothing(spark):
    """A history with no overlap must reproduce the batch-only fates
    exactly (no spurious _hist drops)."""
    from pdf_parser_spark.jobs.curate import curate_documents_incremental

    hist = spark.createDataFrame(
        [("http://other.test/z", _isent(20, 25), None)],
        "url string, text string, error string")
    batch_only = {
        r.url: r.fate for r in curate_documents(_docs(spark)).collect()
    }
    incr = {
        r.url: r.fate
        for r in curate_documents_incremental(_docs(spark), hist).collect()
    }
    assert incr == batch_only


def test_canonicalize_collapses_reskinned_duplicates(spark):
    from pdf_parser_spark.functions.mojibake import _sloppy_cp1252
    from pdf_parser_spark.jobs.curate import curate_documents_incremental

    base = _sent(11)
    reskinned = "CAFÉ " + base.upper() + " — 2024"
    wrecked = _sloppy_cp1252(("Café " + base + " — 2024").encode("utf-8"))
    rows = [
        ("http://c.test/raw", "Cafe " + base + " - 0000", None),
        ("http://c.test/skin", reskinned, None),
        ("http://c.test/moji", wrecked, None),
    ]
    docs = spark.createDataFrame(rows, "url string, text string, error string")
    # raw hashing: three distinct byte strings — exact dedup must NOT
    # fire (near-dup may still link the shingle-similar pair; the
    # keeper is the min-doc_id pick, not necessarily the clean form)
    raw = {r.url: r.fate for r in curate_documents(docs).collect()}
    assert "exact_dup" not in raw.values()
    # canonical hashing: all three collapse to ONE exact group
    canon = {
        r.url: r.fate
        for r in curate_documents(docs, canonicalize=True).collect()
    }
    assert sorted(canon.values()) == ["exact_dup", "exact_dup", "kept"]

    # incremental: history holds the clean form; every reskinned
    # newcomer is an exact_dup_hist
    hist = spark.createDataFrame(
        [("http://h.test/clean", "Cafe " + base + " - 0000")],
        "url string, text string",
    )
    inc = {
        r.url: r.fate
        for r in curate_documents_incremental(
            docs, hist, canonicalize=True
        ).collect()
    }
    assert set(inc.values()) == {"exact_dup_hist"}
