"""Training-shard export: the last stage of the curation story.

A trained-on corpus leaves this engine as fixed-size token windows
(`operators/packing.py::pack_concat`) grouped into shards a data
loader can stream independently. As everywhere in this repo, the
deliverable is the ASSIGNMENT — (doc_id, block_id, doc_from, seg_len,
block_offset) segment rows — not re-materialized token blobs: a
writer that owns the tokenizer streams each shard's segments in
(block_id, block_offset) order and copies token ranges straight out
of the documents table (the same reasoning that keeps `chunks` out of
the documents schema; a pure function of stored data is not stored).

Pipeline composition (tests/test_shards.py drives it end-to-end):

    run_extract_job -> run_curate_job -> compact_table ->
        write_train_shards

Scale (100 TB): pack_concat's distributed prefix-sum does the global
layout (one narrow shuffle, texts never move); shard assignment is
`block_id % n_shards` (pure map — blocks are already a deterministic
pseudo-random document order, so round-robin keeps shards
statistically identical and any prefix of shards is a valid smaller
corpus); the write repartitions the NARROW segment rows once so each
shard lands as one file run, and the manifest aggregate is bounded by
n_shards rows. Nothing here scales with document size, only with
document COUNT.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import pack_concat
from ..sources.catalog import read_table


def shard_assignment(
    segs: DataFrame,
    n_shards: int,
) -> DataFrame:
    """Add the shard column: `block_id % n_shards`. Round-robin over
    the hash-ordered block sequence — shards are equal-sized to within
    one block and each is itself an unbiased corpus sample."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return segs.withColumn(
        "shard", (F.col("block_id") % n_shards).cast("int")
    )


def write_train_shards(
    spark: SparkSession,
    docs_ref: str,
    out_dir: str,
    block: int = 2048,
    n_shards: int = 16,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pk",
) -> dict:
    """Export `docs_ref` as training shards under `out_dir`:

    - ``segments/`` — the per-(document, window) copy plan,
      partitioned by ``shard`` and sorted (shard, block_id,
      block_offset) so a reader streams each shard sequentially
      (partition columns prefixed into the sort, per the
      jobs/compact.py writer-ordering rule).
    - ``manifest/`` — one row per shard: n_blocks, n_segments,
      n_tokens, min/max block_id — the loader's split catalog and
      this job's own consistency check.

    Returns driver-side totals {n_shards, n_blocks, n_segments,
    n_tokens}. Deterministic: rerunning on the same corpus rewrites
    byte-identical assignments (mode=overwrite), which is the resume
    story — there is no partial state to repair."""
    docs = read_table(spark, docs_ref)
    segs = shard_assignment(
        pack_concat(docs, block, n_buckets, text_col, id_col, salt),
        n_shards,
    )
    seg_path = os.path.join(out_dir, "segments")
    (
        segs.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "block_id", "block_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(seg_path)
    )
    written = spark.read.parquet(seg_path)
    manifest = written.groupBy("shard").agg(
        F.countDistinct("block_id").alias("n_blocks"),
        F.count("*").alias("n_segments"),
        F.sum("seg_len").alias("n_tokens"),
        F.min("block_id").alias("min_block"),
        F.max("block_id").alias("max_block"),
    )
    man_path = os.path.join(out_dir, "manifest")
    manifest.coalesce(1).write.mode("overwrite").parquet(man_path)
    totals = (
        spark.read.parquet(man_path)
        .agg(
            F.count("*").alias("shards"),
            F.sum("n_blocks").alias("blocks"),
            F.sum("n_segments").alias("segments"),
            F.sum("n_tokens").alias("tokens"),
        )
        .first()
    )
    return {
        "n_shards": int(totals["shards"]),
        "n_blocks": int(totals["blocks"]),
        "n_segments": int(totals["segments"]),
        "n_tokens": int(totals["tokens"]),
    }
