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
