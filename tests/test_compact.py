"""Small-file compaction (jobs/compact.py): resume appends and
streaming micro-batches fragment the documents table; compaction
rewrites it into target-size files with data unchanged."""

import shutil

from pdf_parser_spark.jobs.compact import (
    compact_table,
    plan_file_count,
    recover_compaction,
)
from pdf_parser_spark.sources import read_table


def test_plan_file_count():
    mb = 1024 * 1024
    assert plan_file_count(0, 256) == 1
    assert plan_file_count(1, 256) == 1
    assert plan_file_count(256 * mb, 256) == 1
    assert plan_file_count(256 * mb + 1, 256) == 2
    assert plan_file_count(10_000 * mb, 256) == 40


def test_compact_path_table(spark, tmp_path):
    ref = str(tmp_path / "docs.parquet")
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    # simulate 5 resume-batch appends -> many small files
    for _ in range(5):
        df.repartition(8).write.mode("append").parquet(ref)
    before = sorted(r.doc_id for r in read_table(spark, ref).collect())

    stats = compact_table(spark, ref, n_files=2)

    assert stats["files_before"] == 40
    assert stats["files_after"] == 2
    after = sorted(r.doc_id for r in read_table(spark, ref).collect())
    assert after == before  # byte-for-byte same rows
    assert not (tmp_path / "docs.parquet.compact-tmp").exists()
    assert not (tmp_path / "docs.parquet.compact-bak").exists()


def test_compact_path_table_sorted_within(spark, tmp_path):
    ref = str(tmp_path / "docs.parquet")
    df = spark.range(500).selectExpr(
        "id as doc_id", "cast(id % 7 as string) as lang"
    )
    df.repartition(16).write.mode("append").parquet(ref)

    compact_table(spark, ref, n_files=1, sort_within=["lang", "doc_id"])

    rows = read_table(spark, ref).collect()  # single file: file order
    keys = [(r.lang, r.doc_id) for r in rows]
    assert keys == sorted(keys)  # row-group min/max pruning order
    assert len(rows) == 500


def test_compact_preserves_partition_layout(spark, tmp_path):
    ref = str(tmp_path / "docs.parquet")
    df = spark.range(600).selectExpr(
        "id as doc_id", "cast(id % 3 as string) as crawl_date"
    )
    # 6 fragmented appends x 8 tasks x 3 values -> many files/partition
    for _ in range(6):
        df.repartition(8).write.mode("append") \
            .partitionBy("crawl_date").parquet(ref)
    before = sorted(
        (r.crawl_date, r.doc_id)
        for r in read_table(spark, ref).collect()
    )

    stats = compact_table(spark, ref, n_files=8,
                          partition_by=["crawl_date"])

    import os

    dirs = sorted(d for d in os.listdir(ref) if d.startswith("crawl_date="))
    assert dirs == ["crawl_date=0", "crawl_date=1", "crawl_date=2"]
    for d in dirs:  # hash-clustered: ONE consolidated file per value
        files = [f for f in os.listdir(os.path.join(ref, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    after = sorted(
        (r.crawl_date, r.doc_id)
        for r in read_table(spark, ref).collect()
    )
    assert after == before
    assert stats["files_after"] == 3 < stats["files_before"]


def test_compact_sort_within_under_partition_by(spark, tmp_path):
    """sort_within combined with partition_by: the partitionBy writer
    requires a sort on the partition columns and would insert its own
    UNSTABLE sort (discarding sort_within) if the incoming order did
    not already satisfy it — compact_table prefixes the partition
    columns so the secondary order survives into each file."""
    ref = str(tmp_path / "docs.parquet")
    df = spark.range(900).selectExpr(
        "id as doc_id", "cast(id % 3 as string) as crawl_date",
        "cast(id % 11 as string) as lang",
    )
    df.repartition(16).write.mode("append") \
        .partitionBy("crawl_date").parquet(ref)

    compact_table(spark, ref, n_files=3, partition_by=["crawl_date"],
                  sort_within=["lang", "doc_id"])

    import os

    for d in sorted(os.listdir(ref)):
        if not d.startswith("crawl_date="):
            continue
        files = [f for f in os.listdir(os.path.join(ref, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
        rows = spark.read.parquet(os.path.join(ref, d, files[0])).collect()
        keys = [(r.lang, r.doc_id) for r in rows]
        assert keys == sorted(keys), d  # secondary sort preserved


def test_recover_compaction_windows(spark):
    """The v1 catalog swap's crash window (stage -> DROP -> RENAME) is
    repairable on either side: crash AFTER the DROP leaves the name
    missing with the rewrite safe in staging (recover completes the
    RENAME); crash BEFORE the DROP leaves a stale staging (recover
    rolls it back). Idempotent: a second call is a no-op."""
    ref = "recover_seam_test"
    staging = f"{ref}__compact_staging"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (ref, staging):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    assert recover_compaction(spark, ref) == "clean"

    # crash AFTER the DROP: staging holds the full rewrite, name gone
    spark.range(100).withColumnRenamed("id", "doc_id") \
        .write.saveAsTable(staging)
    assert recover_compaction(spark, ref) == "completed"
    assert spark.table(ref).count() == 100
    assert not spark.catalog.tableExists(staging)
    assert recover_compaction(spark, ref) == "clean"  # idempotent

    # crash BEFORE the DROP: live ref + stale staging -> roll back
    spark.range(7).withColumnRenamed("id", "doc_id") \
        .write.saveAsTable(staging)
    assert recover_compaction(spark, ref) == "rolled_back"
    assert spark.table(ref).count() == 100  # original stands
    assert not spark.catalog.tableExists(staging)

    spark.sql(f"DROP TABLE {ref}")


def test_compact_catalog_table(spark):
    ref = "compact_seam_test"
    spark.sql(f"DROP TABLE IF EXISTS {ref}")
    spark.sql(f"DROP TABLE IF EXISTS {ref}__compact_staging")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{ref}", ignore_errors=True)
    shutil.rmtree(f"{wh}/{ref}__compact_staging", ignore_errors=True)

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    df.repartition(12).write.saveAsTable(ref)

    stats = compact_table(spark, ref, n_files=1)

    assert stats["files_before"] == 12
    assert stats["files_after"] == 1
    assert read_table(spark, ref).count() == 1000
    assert not spark.catalog.tableExists(f"{ref}__compact_staging")
    spark.sql(f"DROP TABLE {ref}")
