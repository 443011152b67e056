"""Package the engine for `spark-submit --py-files`.

Produces dist/pdf_parser_spark.zip (the library) so the cluster launch
is:

    spark-submit --py-files dist/pdf_parser_spark.zip \
        jobs_submit_extract.py \
        --pages s3://bucket/pages --out s3://bucket/documents

(jobs_submit_extract.py is written next to the zip.)
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "pdf_parser_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "pdf_parser_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    driver = os.path.join(dist, "jobs_submit_extract.py")
    with open(driver, "w") as f:
        f.write('''"""spark-submit driver: pages -> documents with resume.

    spark-submit --py-files pdf_parser_spark.zip jobs_submit_extract.py \\
        --pages <path_or_table> --out <dir> [--buckets 4096] [--run-id r1]
"""
import argparse

from pyspark.sql import SparkSession

from pdf_parser_spark.jobs.extract import run_extract_job


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=4096)
    ap.add_argument("--run-id", default="run1")
    args = ap.parse_args()
    spark = SparkSession.builder.appName("extract_documents").getOrCreate()
    stats = run_extract_job(
        spark, args.pages, args.out,
        run_id=args.run_id, n_buckets=args.buckets,
    )
    print(stats)


if __name__ == "__main__":
    main()
''')
    print(f"wrote {zpath} and {driver}")


if __name__ == "__main__":
    main()
