"""Parquet bloom-filter layout: point-lookup row-group skipping.

Bucketing (jobs/bucketize.py) removes the Exchange from equi-JOINS;
bloom filters serve the OTHER id access pattern — point lookups
("show me doc X", dedup spot-audits) — by letting the scan skip every
row group whose filter proves the key absent, with no sort required.
The reference app holds results in memory per request
(src/pdf_parser.py keeps parsed output on the instance), so layout
concerns have no counterpart there; this is pure north-rule surface.

Verified three ways: the parquet-java footer actually records a
bloom-filter offset for the enabled column (read through the JVM
gateway — pyarrow 16 does not expose it), the filter costs real bytes
on disk, and the data is byte-identical with and without it.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.jobs.bucketize import bloom_options
from pdf_parser_spark.jobs.compact import compact_table


def _bloom_offsets(spark, parquet_file: str) -> dict:
    """{column_name: bloom_filter_offset} for row group 0, via
    parquet-java (offset -1 or exception field absent => no filter)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(parquet_file)
    input_file = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(input_file)
    try:
        blocks = reader.getFooter().getBlocks()
        assert blocks.size() > 0
        out = {}
        cols = blocks.get(0).getColumns()
        for i in range(cols.size()):
            c = cols.get(i)
            out[c.getPath().toDotString()] = c.getBloomFilterOffset()
        return out
    finally:
        reader.close()


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(0, 2000)
        .select(
            F.md5(F.col("id").cast("string")).alias("doc_id"),
            F.col("id").alias("n"),
        )
        .coalesce(1)
    )


def test_bloom_offset_recorded_and_costs_bytes(spark, tmp_path, docs):
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    docs.write.parquet(plain)
    docs.write.options(**bloom_options(["doc_id"], ndv_per_file=2000)).parquet(
        bloomed
    )

    f_plain = glob.glob(plain + "/*.parquet")[0]
    f_bloom = glob.glob(bloomed + "/*.parquet")[0]
    off_plain = _bloom_offsets(spark, f_plain)
    off_bloom = _bloom_offsets(spark, f_bloom)
    assert off_plain["doc_id"] == -1 and off_plain["n"] == -1
    assert off_bloom["doc_id"] > 0  # filter present for the enabled col
    assert off_bloom["n"] == -1  # and ONLY for the enabled col

    import os

    assert os.path.getsize(f_bloom) > os.path.getsize(f_plain)

    # the filter changes layout, never content — and the point lookup
    # it accelerates still returns its row
    a = sorted(r.doc_id for r in spark.read.parquet(bloomed).collect())
    b = sorted(r.doc_id for r in spark.read.parquet(plain).collect())
    assert a == b
    probe = docs.limit(1).collect()[0].doc_id
    hit = spark.read.parquet(bloomed).filter(F.col("doc_id") == probe)
    assert hit.count() == 1


def test_compact_table_threads_bloom_cols(spark, tmp_path, docs):
    src = str(tmp_path / "frag")
    docs.repartition(8).write.parquet(src)  # fragmented table
    stats = compact_table(
        spark, src, n_files=1, bloom_cols=["doc_id"], bloom_ndv=2000
    )
    assert stats["files_after"] < stats["files_before"]
    for f in glob.glob(src + "/*.parquet"):
        assert _bloom_offsets(spark, f)["doc_id"] > 0
    assert spark.read.parquet(src).count() == 2000
