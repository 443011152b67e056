"""Event-time windowed aggregation with watermarked late-data drop —
the Structured Streaming counterpart of the batch `events_hourly`
query (__spark_entry__._q_events_hourly).

Semantics (Spark Structured Streaming, public):
- `withWatermark(ts, delay)`: the engine tracks max event time seen
  and drops rows older than (max - delay); state for windows whose
  end < watermark is finalized and freed.
- append output mode emits a window exactly ONCE, when the watermark
  passes its end — so a late row under the watermark is dropped and
  can never resurrect an already-emitted window.

At crawl scale this is the monitoring/rollup pattern: per-window
partial aggregation map-side, one shuffle on (window, key), state
bounded by the watermark horizon rather than the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "ts timestamp, event_type string, value double"


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )


def events_windowed_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows per event_type with late-row drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_windowed_complete(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
) -> None:
    """Run the windowed aggregation over every currently-visible file
    to COMPLETION and overwrite `out_dir` with the final snapshot, via
    foreachBatch in complete output mode.

    This is the batch-parity mode: complete mode keeps all window
    state (the watermark drops nothing — documented Structured
    Streaming semantics: state cannot be freed when every result row
    must remain emittable), so the final snapshot equals the batch
    groupBy over the same files exactly. Append mode (run_windowed_job)
    trades that for bounded state: it emits each window once when the
    watermark passes it and drops late rows — tests assert both
    behaviors against each other."""

    def write_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        # each micro-batch of complete mode carries the FULL result so
        # far; overwriting leaves the last (= total) snapshot
        batch_df.write.mode("overwrite").parquet(out_dir)

    agg = events_windowed_stream(read_events_stream(spark, events_dir),
                                 window)
    q = (
        agg.writeStream.foreachBatch(write_snapshot)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_windowed_job(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
):
    """One availableNow cycle: process all currently-visible files,
    emit finalized windows (append mode), persist the watermark in the
    checkpoint so the NEXT cycle drops rows that arrived too late."""
    agg = events_windowed_stream(
        read_events_stream(spark, events_dir), window, watermark
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
