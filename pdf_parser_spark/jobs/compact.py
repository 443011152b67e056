"""Small-file compaction for the documents table.

The reference is a single-process app (no counterpart: its exports are
one file per request, `src/csv_exporter.py`), but at the north rule's
scale the documents table accretes small files structurally: every
resume-batch `run_extract_job` APPENDS its own parquet files, and the
streaming variant writes a file set per micro-batch. A 10^12-row table
fed that way degrades every downstream scan — task-per-tiny-file
scheduling, footer-read amplification, and no row-group locality for
the dedup/textstats passes that follow extraction.

This job rewrites a table into ~`target_file_mb` files. It is the
parquet-path sibling of Iceberg's `rewrite_data_files` maintenance
procedure — on a real lakehouse deployment you call that (it compacts
inside snapshot isolation, no rename dance needed); the catalog branch
here stages into a side table and swaps via ALTER TABLE RENAME, the
strongest atomicity the session catalog offers.

Plan shape: ONE round-robin repartition to the computed file count
(`repartition(n)` without keys — no hash skew, perfectly even output
files), optional `sortWithinPartitions` so downstream predicate scans
get row-group min/max pruning on the sort keys (e.g. `lang`,
`quality`); no shuffle key means the exchange is a streaming
round-robin, the cheapest shuffle Spark has. Nothing in the plan
depends on total row count — at 100 TB only `n_files` grows.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import is_path_ref, read_table
from .bucketize import bloom_options

#: parquet target: big enough that footer/stripe overhead is noise and
#: a scan task does real work, small enough to split across executors
DEFAULT_TARGET_MB = 256


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, fn))
    return n, total


def _table_location(spark: SparkSession, ref: str) -> Optional[str]:
    """Filesystem location of a catalog table, if it is file-backed."""
    for row in spark.sql(f"DESCRIBE FORMATTED {ref}").collect():
        if (row.col_name or "").strip() == "Location":
            loc = row.data_type.strip()
            return loc.removeprefix("file:") if loc.startswith("file:") else loc
    return None


def plan_file_count(total_bytes: int, target_file_mb: int) -> int:
    """ceil(bytes / target) with a floor of 1. Parquet compresses the
    in-memory bytes further, so the realized files land under target —
    the safe side (never produces a file Spark can't split)."""
    return max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))


def compact_table(
    spark: SparkSession,
    ref: str,
    target_file_mb: int = DEFAULT_TARGET_MB,
    sort_within: Optional[Sequence[str]] = None,
    n_files: Optional[int] = None,
    partition_by: Optional[Sequence[str]] = None,
    bloom_cols: Optional[Sequence[str]] = None,
    bloom_ndv: int = 1_000_000,
) -> dict:
    """Rewrite `ref` (path or catalog identifier) into ~target-size
    files; returns {"files_before", "files_after", "bytes", "n_files"}.

    Path branch writes to a sibling `<dir>.compact-tmp` then swaps
    directories (old data kept at `<dir>.compact-bak` until the swap
    completes, then removed — a crash mid-swap leaves a recoverable
    state, never a half table). Catalog branch stages into
    `<name>__compact_staging` and swaps with ALTER TABLE RENAME.

    `partition_by` preserves a Hive/Iceberg-style partition layout
    (a crawl table is typically partitioned by fetch date): rows are
    hash-clustered on the partition columns BEFORE the partitionBy
    write, so each task holds whole partition values and each value
    comes out as ONE consolidated file — without the clustering,
    partitionBy writes (tasks × values) files, the classic small-file
    bomb that can leave the table MORE fragmented than it started. A
    single partition value larger than one task's worth of memory
    would need an extra salt column (split files within the value);
    out of scope here — Iceberg's rewrite_data_files handles that case
    with its own bin-packing.

    `bloom_cols` writes per-row-group parquet bloom filters on those
    columns during the rewrite (see `bucketize.bloom_options`) —
    compaction is the natural moment to add them, since it already
    rewrites every byte.
    """
    df = read_table(spark, ref)
    if is_path_ref(ref):
        files_before, total_bytes = _dir_stats(ref)
        location = ref
    else:
        location = _table_location(spark, ref)
        files_before, total_bytes = (
            _dir_stats(location) if location and os.path.isdir(location)
            else (0, 0)
        )
    n = n_files or plan_file_count(total_bytes, target_file_mb)

    if partition_by:
        out = df.repartition(n, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n)
    if sort_within and partition_by:
        # the partitionBy writer REQUIRES a sort on the partition
        # columns and inserts its own (unstable) sort if the incoming
        # order doesn't satisfy it — which would silently discard the
        # sort_within order. Prefixing the partition columns satisfies
        # the writer's requirement AND preserves sort_within as the
        # secondary order inside each partition value.
        out = out.sortWithinPartitions(*partition_by, *sort_within)
    elif sort_within:
        out = out.sortWithinPartitions(*sort_within)

    bopts = bloom_options(bloom_cols, bloom_ndv) if bloom_cols else {}
    if is_path_ref(ref):
        tmp, bak = ref + ".compact-tmp", ref + ".compact-bak"
        writer = out.write.mode("overwrite").options(**bopts)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        os.rename(ref, bak)
        os.rename(tmp, ref)
        import shutil

        shutil.rmtree(bak)
        files_after, _ = _dir_stats(ref)
    else:
        # Preferred: ATOMIC replace (DataFrameWriterV2) — on an
        # Iceberg/v2 catalog this is a single snapshot commit with no
        # visibility window at all (the production analogue of
        # rewrite_data_files). The session catalog's v1 tables reject
        # REPLACE at analysis time (before any compute), so fall back
        # to stage → DROP → RENAME; a crash between the DROP and the
        # RENAME leaves the name missing with the data safe in
        # `<ref>__compact_staging` — `recover_compaction(spark, ref)`
        # repairs either side of that window (tested by a simulated
        # crash in tests/test_compact.py).
        staging = f"{ref}__compact_staging"
        try:
            w2 = out.writeTo(ref).options(**bopts)
            if partition_by:
                w2 = w2.partitionedBy(*[F.col(c) for c in partition_by])
            w2.createOrReplace()
        except Exception as e:
            if "REPLACE TABLE" not in str(e):
                raise
            spark.sql(f"DROP TABLE IF EXISTS {staging}")
            writer = out.write.options(**bopts)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.saveAsTable(staging)
            spark.sql(f"DROP TABLE {ref}")
            spark.sql(f"ALTER TABLE {staging} RENAME TO {ref}")
        loc = _table_location(spark, ref)
        files_after = (
            _dir_stats(loc)[0] if loc and os.path.isdir(loc) else n
        )

    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
        "n_files": n,
    }


def recover_compaction(spark: SparkSession, ref: str) -> str:
    """Repair a catalog compaction interrupted inside the v1 swap
    window (`compact_table`'s DROP → RENAME fallback). Idempotent;
    returns what was done:

    - ``"completed"`` — staging exists and `ref` is missing (crash
      AFTER the DROP): the compacted data is published by finishing
      the RENAME. Nothing was lost — the staging table held the full
      rewrite.
    - ``"rolled_back"`` — staging exists alongside a live `ref`
      (crash BEFORE the DROP): the rewrite never swapped in, so the
      stale staging copy is dropped and the original table stands.
    - ``"clean"`` — no staging table; nothing to do.

    Run this before reading `ref` after any compaction job whose
    driver may have died (a real deployment puts it in the job's
    startup path; the Iceberg/v2 branch never needs it — its replace
    is one atomic snapshot commit).
    """
    staging = f"{ref}__compact_staging"
    if not spark.catalog.tableExists(staging):
        return "clean"
    if spark.catalog.tableExists(ref):
        spark.sql(f"DROP TABLE {staging}")
        return "rolled_back"
    spark.sql(f"ALTER TABLE {staging} RENAME TO {ref}")
    return "completed"
