"""Stateful streaming dedup: emit each content fingerprint's FIRST
document, drop every later duplicate — across micro-batches and across
restarts (the state store persists under the checkpoint).

This is the `applyInPandasWithState` custom-stateful-operator pattern:
state is keyed by md5(text) (16-byte keys shuffle, texts don't), the
per-key state is a single boolean, and output mode is append. At
crawl scale this is the streaming twin of operators/dedup.exact_dedup.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("fingerprint", StringType()),
    StructField("url", StringType()),
    StructField("text", StringType()),
])

STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _first_per_key(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # fingerprint already emitted in an earlier batch
    for pdf in pdfs:
        if len(pdf):
            state.update((True,))
            yield pdf.iloc[[0]][["fingerprint", "url", "text"]]
            return


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """streaming documents (url, text) → first-seen rows only."""
    keyed = docs.select(
        F.md5(F.col("text")).alias("fingerprint"), "url", "text"
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _first_per_key,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(spark, pages_dir: str, out_dir: str,
                     checkpoint_dir: str):
    """File-source pages → extraction → stateful dedup → parquet."""
    from .extract_stream import extract_documents_stream, read_pages_stream

    docs = extract_documents_stream(read_pages_stream(spark, pages_dir))
    deduped = streaming_exact_dedup(docs.select("url", "text"))
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
