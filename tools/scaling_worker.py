"""One scaling measurement at a given parallelism: warm-up pass then a
timed full extraction pass over a pre-materialized pages parquet.

Usage: python tools/scaling_worker.py <cpus> <pages_path>
Prints one JSON line {"cpus": N, "n_docs": ..., "sec": ..., "docs_per_sec": ...}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pdf_parser_spark.jobs.extract import extract_documents  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    pages_path = sys.argv[2]
    # fixed partition count at every parallelism level: the JOB is
    # identical, only the executor-slot count varies (as on a real
    # cluster where the table's partitioning doesn't change with
    # cluster size)
    partitions = 64
    spark = get_spark("scaling", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    n = pages.count()

    # warm-up: JIT the JVM, fork+import the Python workers (5% sample)
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
        "cpus": cpus, "n_docs": n, "extracted": res["n"],
        "sum_chars": res["chars"], "errors": res["err"],
        "sec": round(sec, 2), "docs_per_sec": round(n / sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
