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
