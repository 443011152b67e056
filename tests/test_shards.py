"""Training-shard export (jobs/shards.py): layout, manifest
consistency, determinism, and equivalence with the packing operator."""

import glob

from pyspark.sql import functions as F

from pdf_parser_spark.jobs.shards import shard_assignment, write_train_shards
from pdf_parser_spark.operators.packing import pack_concat

SF = "/root/testdata/sf0.001"


def test_write_train_shards_layout_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    totals = write_train_shards(
        spark, f"{SF}/documents.parquet", out,
        block=256, n_shards=4, n_buckets=8,
    )
    # every shard directory exists
    dirs = sorted(glob.glob(f"{out}/segments/shard=*"))
    assert len(dirs) == 4

    segs = spark.read.parquet(f"{out}/segments")
    man = {r.shard: r for r in spark.read.parquet(f"{out}/manifest").collect()}
    assert set(man) == {0, 1, 2, 3}

    # manifest rows match the written data exactly
    got = {
        r.shard: r
        for r in segs.groupBy("shard").agg(
            F.countDistinct("block_id").alias("b"),
            F.count("*").alias("s"),
            F.sum("seg_len").alias("t"),
        ).collect()
    }
    for sh, m in man.items():
        assert (m.n_blocks, m.n_segments, m.n_tokens) == (
            got[sh].b, got[sh].s, got[sh].t
        )
    assert totals["n_segments"] == segs.count()

    # blocks are dense 0..max and round-robin: shard == block % 4
    blocks = segs.select("block_id", "shard").distinct().collect()
    ids = sorted(r.block_id for r in blocks)
    assert ids == list(range(len(ids)))
    assert all(r.shard == r.block_id % 4 for r in blocks)


def test_shards_equal_packing_operator(spark, tmp_path):
    out = str(tmp_path / "shards2")
    write_train_shards(
        spark, f"{SF}/documents.parquet", out,
        block=256, n_shards=4, n_buckets=8,
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = sorted(
        tuple(r) + (r.block_id % 4,)
        for r in pack_concat(docs, block=256, n_buckets=8).collect()
    )
    got = sorted(
        (r.doc_id, r.n_tokens, r.block_id, r.doc_from, r.seg_len,
         r.block_offset, r.shard)
        for r in spark.read.parquet(f"{out}/segments").collect()
    )
    assert got == want

    # zero waste end-to-end: token totals survive the export
    n_tok = docs.selectExpr(
        "sum(CASE WHEN size(split(trim(text), '\\\\s+')) > 0 "
        "AND length(trim(text)) > 0 "
        "THEN size(split(trim(text), '\\\\s+')) ELSE 0 END) AS t"
    ).first()["t"]
    assert sum(r[4] for r in got) == n_tok


def test_write_train_shards_deterministic_rerun(spark, tmp_path):
    out = str(tmp_path / "shards3")
    t1 = write_train_shards(
        spark, f"{SF}/documents.parquet", out,
        block=512, n_shards=2, n_buckets=4,
    )
    first = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/segments").collect()
    )
    t2 = write_train_shards(
        spark, f"{SF}/documents.parquet", out,
        block=512, n_shards=2, n_buckets=4,
    )
    second = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/segments").collect()
    )
    assert t1 == t2 and first == second


def test_shard_assignment_guard(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    segs = pack_concat(docs, block=256, n_buckets=4)
    try:
        shard_assignment(segs, 0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
