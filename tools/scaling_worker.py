"""One scaling measurement at a given parallelism: warm-up pass then a
timed full extraction pass over a pre-materialized pages parquet.

Usage: python tools/scaling_worker.py <cpus> <pages_path> [mode]

mode:
  thread (default) — master=local[cpus]: executor slots are threads in
      ONE JVM. Cheap, but driver/GC/shuffle service costs are shared
      across all slots, an overhead shape no real cluster has.
  jvm — master=local-cluster[cpus,1,4096]: cpus SEPARATE single-core
      executor JVMs, each with its own heap, GC, shuffle server, and
      Python workers, code shipped via --py-files (the dist/ zip), the
      driver only scheduling — exactly the shape of an N-executor
      cluster, which is what the north rule's two-cluster-size
      criterion models. Per-executor overhead scales WITH the executor
      count at this level, as on a real cluster.

Prints one JSON line {"cpus": N, "mode": ..., "n_docs": ..., "sec": ...,
"docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.jobs.extract import extract_documents  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cpus = int(sys.argv[1])
    pages_path = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "thread"
    # fixed partition count at every parallelism level: the JOB is
    # identical, only the executor-slot count varies (as on a real
    # cluster where the table's partitioning doesn't change with
    # cluster size)
    partitions = 64
    if mode == "jvm":
        # N separate executor JVMs, 1 core / 3g heap each; package
        # shipped the spark-submit way (--py-files zip) since executor
        # JVMs don't inherit the driver's sys.path
        spark = get_spark(
            "scaling", master=f"local-cluster[{cpus},1,4096]",
            shuffle_partitions=max(cpus, 8),
            extra_conf={
                "spark.submit.pyFiles": os.path.join(
                    REPO, "dist", "pdf_parser_spark.zip"),
                "spark.executor.memory": "3g",
            },
        )
    else:
        spark = get_spark("scaling", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    n = pages.count()

    # warm-up: JIT the JVMs, fork+import the Python workers (5% sample)
    warm = pages.sample(0.05, seed=1)
    extract_documents(warm, partitions=partitions).agg(F.count("*")).collect()

    t0 = time.time()
    out = extract_documents(pages, partitions=partitions)
    res = out.agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("chars"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("err"),
    ).collect()[0]
    sec = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "mode": mode, "n_docs": n, "extracted": res["n"],
        "sum_chars": res["chars"], "errors": res["err"],
        "sec": round(sec, 2), "docs_per_sec": round(n / sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
