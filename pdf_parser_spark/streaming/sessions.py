"""Streaming sessionization: the Structured Streaming counterpart of
the batch gap-session operator (operators/events.py::sessionize),
built on the native `F.session_window` state store (public Spark API;
merging session state, watermark-bounded).

Semantics alignment with the batch operator:

- `session_window(ts, gap)` merges an event into a session while it
  arrives within `gap` of the session's current end; the emitted
  window's `end` is `last_event_ts + gap`, so `end_us` here subtracts
  the gap back out — the output schema (user, start_us, end_us,
  n_events, duration_secs, sum_value) is the batch operator's, keyed
  by (user, start_us) instead of the batch ordinal `sess_n` (a global
  per-user ordinal is meaningless on an unbounded stream).
- One boundary divergence is inherent and documented: an event at
  EXACTLY gap after its predecessor extends the session in the batch
  operator (`diff > gap` starts a new one) while `session_window`'s
  half-open [ts, ts+gap) window does not include the instant ts+gap.
  Real event times (micro-second resolution) never sit on the exact
  boundary; the parity test runs on the real fixture where the two
  agree row-for-row.

At 100 TB/day the streaming form is the one you run: state is
per-open-session (freed once the watermark passes a session's end),
so memory is bounded by the active-user horizon, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def read_session_events(spark: SparkSession, events_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(SESSION_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )


def sessions_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_secs: int = 900,
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked gap sessions per user; batch-shaped output."""
    gap_us = int(gap_secs) * 1_000_000
    sw = F.session_window(F.col(ts_col), f"{int(gap_secs)} seconds")
    start = F.unix_micros(F.col("session_window.start"))
    end = F.unix_micros(F.col("session_window.end")) - F.lit(gap_us)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), sw)
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal sum, matching the batch operator's
            # order-independent sum_value (operators/events.py)
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(user_col),
            start.alias("start_us"),
            end.alias("end_us"),
            F.round((end - start) / 1e6, 6).alias("duration_secs"),
            "n_events",
            "sum_value",
        )
    )


def run_sessions_complete(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_secs: int = 900,
) -> None:
    """Run sessionization over every currently-visible file to
    COMPLETION (foreachBatch + complete mode — the batch-parity mode:
    no state is freed, the final snapshot equals the batch operator
    over the same files; same protocol as windowed.py)."""

    def write_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    agg = sessions_stream(
        read_session_events(spark, events_dir), gap_secs=gap_secs
    )
    q = (
        agg.writeStream.foreachBatch(write_snapshot)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
