"""Streaming interval join: the Structured Streaming counterpart of
the batch banded interval join (operators/events.py::interval_join) —
"every right event within `window_secs` AFTER a left event with the
same key", over two unbounded streams.

Uses Spark's native watermarked stream-stream inner join (public API;
symmetric hash join on the equi-key with the event-time range as the
state-eviction bound): with BOTH sides watermarked and the join
condition carrying an explicit time range, the state store holds only
rows younger than `watermark + window_secs` — bounded by the lateness
horizon, not the stream length, which is what makes the join runnable
forever at 100 TB/day.

This is a genuinely different execution path from the batch
operator's bucket-fan-out equi-join, so the batch-parity test
(tests/test_events.py) cross-checks the ALGORITHM, not just the
wiring: the streaming result over a finite fixture must equal
`interval_join` row-for-row (inner joins in append mode emit every
match exactly once).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessions import SESSION_EVENTS_SCHEMA


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(SESSION_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    window_secs: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: all (left, right) pairs
    with equal ``on`` keys and ``0 <= right_ts - left_ts <=
    window_secs``; output schema matches the batch operator (left
    columns + right payload + ``delta_us``)."""
    if window_secs <= 0:
        raise ValueError(f"window_secs must be > 0, got {window_secs}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {int(window_secs)} SECONDS"))
    )
    delta = F.unix_micros(rt) - F.unix_micros(lt)
    return l.join(r, cond).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right_cols],
        delta.alias("delta_us"),
    )


def run_interval_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    window_secs: int,
    left_select: Sequence[str] = ("*",),
    right_select: Sequence[str] = ("*",),
) -> None:
    """Join every currently-visible file pair to completion
    (availableNow; inner joins emit once per match in append mode, so
    the accumulated output over a finite fixture equals the batch
    operator)."""
    l = read_event_stream(spark, left_dir).selectExpr(*left_select)
    r = read_event_stream(spark, right_dir).selectExpr(*right_select)
    joined = interval_join_stream(
        l, r, on, left_ts, right_ts, right_cols, window_secs
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
