"""Streaming trending terms: watermarked windowed term frequencies
over a document stream, with per-window top-k served from the
snapshot — "what is this hour's crawl talking about", the live
counterpart of the batch corpus statistics (operators/terms.py) and
the monitoring signal a continuous-crawl pipeline wants next to the
corpus-report job.

Shape: explode tokens map-side (the same TERM_REGEX tokenizer as the
batch tier — trends must be comparable to the corpus statistics) →
watermarked tumbling-window groupBy (window, term). The aggregation
state is per (window, term-in-window) and freed when the watermark
passes the window end, so memory is bounded by the vocabulary of the
ACTIVE window horizon, not the stream. The Zipf-hot term keys are
exactly the partial-aggregation story of the batch df tier: `the`
arrives at its reducer pre-counted per micro-batch partition.

Batch parity: `run_trending_complete` (foreachBatch + complete mode
+ availableNow, the repo's streaming-oracle protocol) over static
files must equal the batch `trending_terms_batch` over the same
files row-for-row — pinned in tests/test_trending.py. The top-k cut
runs on the SNAPSHOT (a rank over an unbounded stream would need
arbitrary stateful output; the windowed counts are the streaming
state, ranking is a view over it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.terms import _terms

DOC_STREAM_SCHEMA = "doc_id long, warc_ts timestamp, text string"


def read_doc_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_dir)
    )


def trending_stream(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """(win_start_us, win_end_us, term, n) — watermarked tumbling
    windows of term occurrence counts (per-doc multiplicity counts,
    like tf; dedup per doc belongs to the df statistic, not a
    trend)."""
    toks = docs.withWatermark(ts_col, watermark).select(
        F.col(ts_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    w = F.window(F.col(ts_col), window)
    return (
        toks.groupBy(w, "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            F.unix_micros(F.col("window.end")).alias("win_end_us"),
            "term",
            "n",
        )
    )


def trending_terms_batch(
    docs: DataFrame,
    window: str = "1 hour",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Batch twin of :func:`trending_stream` (same expressions, no
    watermark — the parity oracle and the backfill path)."""
    toks = docs.select(
        F.col(ts_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    w = F.window(F.col(ts_col), window)
    return (
        toks.groupBy(w, "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            F.unix_micros(F.col("window.end")).alias("win_end_us"),
            "term",
            "n",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 10) -> DataFrame:
    """Deterministic per-window top-k over a counts snapshot
    (n DESC, term ASC tie-break; WindowGroupLimit prunes map-side)."""
    rank = F.row_number().over(
        Window.partitionBy("win_start_us")
        .orderBy(F.col("n").desc(), F.col("term"))
    )
    return (
        counts.withColumn("rank", rank)
        .where(F.col("rank") <= k)
        .select("win_start_us", "win_end_us", "term", "n", "rank")
    )


def run_trending_complete(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
) -> None:
    """Drain every currently-visible file to completion and snapshot
    the full windowed counts (foreachBatch + complete mode +
    availableNow — the batch-parity protocol of windowed.py)."""

    def write_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    agg = trending_stream(read_doc_stream(spark, docs_dir), window=window)
    q = (
        agg.writeStream.foreachBatch(write_snapshot)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
