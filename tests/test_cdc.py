"""Content-defined chunking (operators/cdc.py): reconstruction,
boundary determinism, shift resilience (the property CDC exists
for), python/spark agreement, edge cases."""

import pytest

from pdf_parser_spark.operators import cdc

SF = "/root/testdata/sf0.001"


def test_chunks_reconstruct_text(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    rows = {d.doc_id: d.text for d in docs.collect()}
    per = {}
    for r in cdc.cdc_chunks(docs).collect():
        per.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in per.items():
        chunks.sort(key=lambda c: c.chunk_idx)
        text = rows[doc_id]
        # contiguous cover: starts/lengths tile the text exactly
        pos = 0
        for c in chunks:
            assert c.start == pos and c.length > 0
            pos += c.length
        assert pos == len(text)


def test_spark_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    per = {}
    for r in cdc.cdc_chunks(docs).collect():
        per.setdefault(r.doc_id, []).append((r.chunk_idx, r.start,
                                             r.length, r.chunk_hash))
    for d in docs.collect():
        ref = cdc.cdc_chunks_py(d.text)
        got = [(s, l, h) for _, s, l, h in sorted(per[d.doc_id])]
        assert got == ref


def test_shift_resilience_beats_fixed_blocks(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    texts = [d.text for d in docs.collect() if len(d.text) > 120]
    shared_cdc, shared_fixed, total = 0, 0, 0
    B = 64
    for t in texts:
        t2 = "INSERTED! " + t
        h1 = {h for _, _, h in cdc.cdc_chunks_py(t)}
        h2 = {h for _, _, h in cdc.cdc_chunks_py(t2)}
        f1 = {t[i:i + B] for i in range(0, len(t), B)}
        f2 = {t2[i:i + B] for i in range(0, len(t2), B)}
        shared_cdc += len(h1 & h2)
        shared_fixed += len(f1 & f2)
        total += len(h1)
    # CDC re-aligns after the insertion; fixed blocks lose everything
    assert shared_cdc > 0.5 * total
    assert shared_cdc > 2 * shared_fixed


def test_empty_and_tiny_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, None)], "doc_id long, text string"
    )
    rows = cdc.cdc_chunks(docs).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_id and 3 not in by_id
    assert len(by_id[2]) == 1 and by_id[2][0].length == 1


def test_avg_bits_controls_chunk_size(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    small = cdc.cdc_chunks(docs, avg_bits=4).groupBy().avg("length").head()[0]
    big = cdc.cdc_chunks(docs, avg_bits=7).groupBy().avg("length").head()[0]
    assert small < big


def test_bad_avg_bits(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc.cdc_chunks(docs, avg_bits=0)
    with pytest.raises(ValueError):
        cdc.cdc_chunks(docs, avg_bits=25)
