"""Table I/O seam: filesystem paths read as parquet, catalog
identifiers as managed tables (Iceberg in production).

The north rule's input is "an Iceberg table of Common-Crawl-style web
pages" and progress is "written as an Iceberg lineage/metrics table"
(BASELINE.json north_star). The sandbox ships no Iceberg runtime jar,
so local tests exercise the parquet branch plus the CATALOG branch via
Spark's built-in session catalog (same DataFrameV2 code path); on a
real cluster the SAME job code reads/writes Iceberg by passing a
catalog identifier instead of a path, with the catalog configured at
session build:

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:... \\
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.crawl.type=rest \\
      --conf spark.sql.catalog.crawl.uri=https://<metastore>/ ...

and then `pages_ref="crawl.web.pages"`, `out="crawl.web.documents"`.

Dispatch rule: a ref containing a path separator (or ending in
`.parquet`) is a filesystem path -> `spark.read.parquet` /
`DataFrameWriter.parquet`; anything else is a catalog identifier ->
`spark.table` / `df.writeTo(...)` (the DataFrameWriterV2 API, which is
the Iceberg-native write path — appends honor the table's declared
partition spec and produce a new snapshot, giving the lineage table
atomic per-run commits for free).

Why a seam instead of `format("iceberg")` literals: every query in
this engine is declarative DataFrame code, so the ONLY difference
between a 60k-row parquet fixture and a 10^12-row Iceberg table is
where the scan/sink nodes point. Keeping that choice in one module
means jobs, tests, and the oracle gate all run the identical plan
above the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_path_ref(ref: str) -> bool:
    """True if `ref` names a filesystem location rather than a catalog
    table. Paths contain a separator or a storage scheme (file:/,
    s3a://...) or end in .parquet; catalog identifiers are dotted
    names (`crawl.web.pages`) or bare table names."""
    return (os.sep in ref or "/" in ref or "://" in ref
            or ref.endswith(".parquet"))


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Scan a pages/documents table by path (parquet) or catalog
    identifier (Iceberg/managed). Both branches return an identical
    lazy scan node — filters and column pruning push down either way
    (Iceberg additionally prunes partitions/files from its manifest
    stats)."""
    if is_path_ref(ref):
        return spark.read.parquet(ref)
    return spark.table(ref)


def table_exists(spark: SparkSession, ref: str) -> bool:
    if is_path_ref(ref):
        return os.path.exists(ref)
    return spark.catalog.tableExists(ref)


def append_table(df: DataFrame, ref: str, provider: str = "parquet") -> None:
    """Append rows to a table by path or catalog identifier, creating
    it on first write.

    Catalog branch uses DataFrameWriterV2: `create()` on first write
    (`provider` only applies here — on an Iceberg catalog the catalog
    itself fixes the format), `append()` afterwards. Iceberg appends
    are atomic snapshot commits, which is exactly the semantics the
    per-run lineage appends rely on (a failed run never publishes a
    partial lineage row set)."""
    if is_path_ref(ref):
        df.write.mode("append").parquet(ref)
        return
    spark = df.sparkSession
    if spark.catalog.tableExists(ref):
        try:
            df.writeTo(ref).append()
        except Exception as e:  # pragma: no cover - message-dispatch
            # Spark's built-in session catalog (the sandbox stand-in)
            # serves V1 tables, which the V2 append rejects; Iceberg
            # catalogs serve V2 tables and take the primary path.
            if "v1 table" not in str(e):
                raise
            df.write.mode("append").saveAsTable(ref)
    else:
        df.writeTo(ref).using(provider).create()
