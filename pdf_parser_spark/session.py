"""SparkSession factory with the scale-tuned configuration.

All jobs and tests build their session here so the AQE / Arrow /
shuffle settings named by the north rule (BASELINE.json:6,14) are
applied uniformly:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow-batched pandas UDFs with a bounded batch size (pages carry
  large ``html:binary`` payloads, so the default 10k records/batch
  would blow executor memory at 100 TB scale),
- shuffle partitions sized for local[k] testing; on a real cluster
  this is overridden on spark-submit (AQE coalesces down anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Arrow batch size for extraction UDFs. Crawl pages average ~100 KB
#: (cap 16 MB per the reference's upload limit, app.py:20); 256 rows
#: bounds a batch near 25 MB typical / manageable worst case.
ARROW_BATCH_ROWS = 256


def get_spark(
    app_name: str = "pdf_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        # large binary rows: keep file-split sizing moderate so one task
        # doesn't accumulate too many multi-MB documents
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
