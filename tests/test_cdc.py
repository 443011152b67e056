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


def test_chunk_delta_accounting(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    old = docs.select("doc_id", "text")
    new = docs.selectExpr(
        "doc_id",
        "CASE doc_id % 3 WHEN 0 THEN text"
        " WHEN 1 THEN 'NEWLY INSERTED PREAMBLE ' || text"
        " ELSE translate(text, 'aeiou', 'xyzqw') END AS text",
    )
    rows = {r.doc_id: r
            for r in cdc.chunk_delta(old, new, key_col="doc_id").collect()}
    tot_shared = tot_added = 0
    for doc_id, r in rows.items():
        v = doc_id % 3
        if v == 0:   # unchanged: everything shared
            assert r.n_added == 0 and r.n_removed == 0 and r.n_shared > 0
        elif v == 1:  # prefix insert: most chunks re-align
            tot_shared += r.bytes_shared
            tot_added += r.bytes_added
        else:        # vowel rewrite: nothing survives
            assert r.n_shared == 0 and r.n_added > 0
    # storing the re-crawl of prefix-edited pages costs a fraction
    # of their size — the CDC selling point
    assert tot_added < 0.6 * (tot_added + tot_shared)


def test_chunk_delta_twin(spark):
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new_expr = (
        "CASE doc_id % 3 WHEN 0 THEN text"
        " WHEN 1 THEN 'NEWLY INSERTED PREAMBLE ' || text"
        " ELSE translate(text, 'aeiou', 'xyzqw') END"
    )
    got = sorted(
        tuple(r)
        for r in cdc.chunk_delta(
            docs.select("doc_id", "text"),
            docs.selectExpr("doc_id", f"{new_expr} AS text"),
            key_col="doc_id",
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(
        con.execute(cdc.chunk_delta_sql(
            "SELECT doc_id, text FROM documents",
            f"SELECT doc_id, {new_expr} AS text FROM documents",
            key_col="doc_id",
        )).fetchall()
    )
    assert got == want and len(got) == docs.count()
