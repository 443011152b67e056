"""Block sequence packing (operators/packing.py): per-group cumsum bin
assignment matches an independent per-row recomputation."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.packing import GROUP_STRIDE, pack_blocks


@pytest.fixture(scope="module")
def docs(spark):
    # word counts 1..40, a few giants (> capacity) sprinkled in
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_repeat(
                F.lit("w"),
                F.when(F.col("id") % 97 == 0, 300)
                .otherwise((F.col("id") % 40 + 1).cast("int")),
            ),
        ).alias("text"),
    ).persist()


def test_pack_blocks_matches_sequential_recomputation(docs):
    out = pack_blocks(docs, capacity=128, n_groups=8).collect()
    rows = sorted(out, key=lambda r: (r.group_id, r.doc_id))
    running = {}
    for r in rows:
        start = running.get(r.group_id, 0)
        assert r.bin_id == r.group_id * GROUP_STRIDE + start // 128, r
        assert r.bin_offset == start % 128, r
        running[r.group_id] = start + r.n_tokens
    assert len(rows) == 500
    # group assignment is doc_id % n_groups
    assert all(r.group_id == r.doc_id % 8 for r in rows)


def test_pack_blocks_fill_and_offsets(docs):
    out = pack_blocks(docs, capacity=128, n_groups=8)
    assert out.where(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= 128)
    ).count() == 0
    # non-straddling bins (every member starts and ends inside) fill
    # to <= capacity; straddlers overflow by < their own length
    fills = out.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.max("n_tokens").alias("mx"))
    bad = fills.where(F.col("fill") - F.col("mx") >= 128).count()
    assert bad == 0
    # packing is tight: average fill of non-final bins per group ~128
    n_bins = fills.count()
    total = sum(r.n_tokens for r in out.select("n_tokens").collect())
    assert total / n_bins > 0.6 * 128


def test_pack_blocks_rejects_bad_capacity(docs):
    with pytest.raises(ValueError):
        pack_blocks(docs, capacity=0)


# ------------------------------------------------ concat-and-chunk

def test_pack_concat_stream_invariants(docs):
    from pdf_parser_spark.operators.packing import pack_concat

    block = 128
    segs = pack_concat(docs, block=block, n_buckets=16).collect()
    total_toks = sum(
        r.n_tokens
        for r in docs.selectExpr(
            "doc_id",
            "size(split(trim(text), '\\\\s+')) AS n_tokens"
        ).collect()
        if r.n_tokens > 0
    )
    # zero waste: segment lengths tile the token stream exactly
    assert sum(r.seg_len for r in segs) == total_toks
    # every block except the last is exactly full
    by_block = {}
    for r in segs:
        by_block.setdefault(r.block_id, 0)
        by_block[r.block_id] += r.seg_len
    last = max(by_block)
    assert set(by_block) == set(range(last + 1))     # dense block ids
    for b, fill in by_block.items():
        if b != last:
            assert fill == block, (b, fill)
    # offsets in range; per-doc segments contiguous from 0
    per_doc = {}
    for r in segs:
        assert 0 <= r.block_offset < block
        assert r.seg_len >= 1
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.block_id)
        want_from = 0
        for r in rs:
            assert r.doc_from == want_from
            want_from += r.seg_len
        assert want_from == rs[0].n_tokens


def test_pack_concat_split_arithmetic(spark):
    from pdf_parser_spark.operators.packing import pack_concat

    # 3 docs of 5 tokens, block 4: stream = 15 tokens -> blocks of
    # 4/4/4/3; whichever order the draws pick, the doc at offset 0
    # splits 4+1, the next 3+2, the next 2+3
    df = spark.createDataFrame(
        [(i, "t t t t t") for i in range(3)], "doc_id long, text string"
    )
    segs = sorted(
        pack_concat(df, block=4, n_buckets=2).collect(),
        key=lambda r: (r.block_id, r.block_offset),
    )
    assert [r.seg_len for r in segs] == [4, 1, 3, 2, 2, 3]
    assert [r.doc_from for r in segs] == [0, 4, 0, 3, 0, 2]
    # rerun is identical
    again = sorted(
        pack_concat(df, block=4, n_buckets=2).collect(),
        key=lambda r: (r.block_id, r.block_offset),
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in segs]


def test_pack_concat_zero_token_docs_excluded(spark):
    from pdf_parser_spark.operators.packing import pack_concat

    df = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "   "), (3, "d")],
        "doc_id long, text string",
    )
    segs = pack_concat(df, block=2, n_buckets=2).collect()
    assert {r.doc_id for r in segs} == {0, 3}
    assert sum(r.seg_len for r in segs) == 4


def test_pack_concat_twin(spark):
    import duckdb

    from pdf_parser_spark.operators.packing import (
        pack_concat,
        pack_concat_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        tuple(r) for r in pack_concat(docs, block=256, n_buckets=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            pack_concat_sql("documents", block=256, n_buckets=8)
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0
