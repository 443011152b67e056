"""Materialized MinHash-LSH dedup index (VERDICT r2 #7).

The (doc_id, band_key) relation — `operators.dedup.band_table` — is
the whole dedup index: every LSH consumer (candidate pairs, dropped-
bucket observability, incremental re-dedup of a grown corpus) starts
from it, and the per-shingle md5 signature work that produces it is
the expensive map. This job writes that relation ONCE; subsequent runs
pass the loaded index to `minhash_lsh_candidates(index=...)` and skip
the signature pass entirely.

Layout at scale: rows are repartitioned by `band_key` before the
write, so every bucket's rows are clustered into the same files and
the candidate join's shuffle reads sequential runs. On a lakehouse
deployment the same relation would be a bucketed table
(`bucketBy(band_key).sortBy(band_key)` via saveAsTable), which lets
the downstream groupBy skip its Exchange outright; plain parquet keeps
this demo engine-agnostic.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import band_table


def build_dedup_index(
    df: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    partitions: Optional[int] = None,
) -> None:
    """One pass over the corpus: signature fold → band keys → write
    (id, band_key) clustered by band_key. Overwrites `out_path`."""
    spark = df.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism * 2
    (
        band_table(df, text_col, id_col, shingle_n)
        .repartition(partitions, "band_key")
        .sortWithinPartitions("band_key")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def load_dedup_index(spark: SparkSession, path: str) -> DataFrame:
    """The materialized (id, band_key) relation, ready for
    `minhash_lsh_candidates(df=None-ish, index=...)` or any other
    band-bucket consumer."""
    return spark.read.parquet(path)
