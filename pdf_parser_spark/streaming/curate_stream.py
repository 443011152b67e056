"""Streaming curation: each micro-batch of extracted documents is
curated INCREMENTALLY against the corpus accumulated by all earlier
batches, and only novel kept rows are appended — the continuous
analogue of the daily `run_curate_job(history_ref=...)` loop
(jobs/curate.py).

Shape: foreachBatch. The LSH near-dedup needs joins, drop-lists, and
a convergence loop that the streaming engine cannot express as an
incremental stateful operator (and should not: the corpus side is a
TABLE, not stream state — at 10^12 rows it lives in the lakehouse,
not in a state store). foreachBatch hands each micro-batch over as a
plain DataFrame, so the exact batch operators run unchanged and the
corpus append is a normal table write; `applyInPandasWithState` stays
the right tool for the narrow first-seen-fingerprint stream
(dedup_stream.py), not for whole-pipeline curation.

Exactly-once note: the corpus/metrics appends in foreachBatch are not
transactional with the checkpoint — a crash between the append and
the commit can replay one batch. The doc_id-keyed appends make the
replay observable (duplicate doc_ids in the corpus); on a lakehouse
deployment the batch write becomes an idempotent MERGE/overwrite-by-
batch-id, which is the documented Structured Streaming recipe for
exactly-once foreachBatch sinks.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import release_cached
from ..jobs.curate import curate_documents, curate_documents_incremental
from ..sources.catalog import append_table, read_table, table_exists


def curate_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_ref: str,
    metrics_ref: str,
    **curate_kwargs,
) -> dict:
    """Curate ONE micro-batch against the accumulated corpus and
    append the kept rows + per-fate metrics. Also the unit the test
    drives directly; `run_curate_stream` wires it into foreachBatch."""
    if table_exists(spark, corpus_ref):
        tagged = curate_documents_incremental(
            batch_df, read_table(spark, corpus_ref), **curate_kwargs
        )
    else:  # first batch: nothing to be incremental against
        tagged = curate_documents(batch_df, **curate_kwargs)
    # localCheckpoint, NOT persist: the tagged plan READS corpus_ref
    # (the history side) and this function APPENDS to it below — a
    # read-modify-write cycle on one table. A lazily-cached plan can
    # recompute after the append (measured: the metrics aggregate saw
    # the just-appended rows as "history" and re-fated them
    # url_dup_hist), so the batch is materialized EAGERLY here,
    # severing the plan from the table before the table changes.
    tagged = tagged.localCheckpoint()
    kept = tagged.where(F.col("fate") == "kept").drop("fate")
    append_table(kept, corpus_ref)
    fates = {
        r["fate"]: r["n"]
        for r in tagged.groupBy("fate").agg(F.count("*").alias("n")).collect()
    }
    metrics = spark.createDataFrame(
        [(int(batch_id), k, int(v)) for k, v in sorted(fates.items())],
        "batch_id long, fate string, n_docs long",
    )
    append_table(metrics, metrics_ref)
    release_cached()  # LSH band-table caches from this batch
    return fates


def run_curate_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = 1,
    **curate_kwargs,
):
    """File-source documents stream → per-batch incremental curation →
    growing curated corpus + per-batch fate metrics.

    `max_files_per_trigger=1` makes each arriving file its own
    micro-batch (the crawl-dump-at-a-time cadence); None lets the
    engine batch all available files. Runs with availableNow (drains
    what exists, then stops) — a deployment drops the trigger for a
    continuous run.
    """
    schema = read_table(spark, docs_dir).schema  # static pass for schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    corpus_ref = os.path.join(out_dir, "curated.parquet")
    metrics_ref = os.path.join(out_dir, "curation_metrics.parquet")

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        curate_batch(spark, batch_df, batch_id, corpus_ref, metrics_ref,
                     **curate_kwargs)

    q = (
        docs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
