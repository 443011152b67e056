"""Session-scoped registry for DataFrames persisted inside operators.

Several operators persist an intermediate (the exploded LSH band
table, the simhash signature aggregate, the shingle table, the
hyperplane-keyed embedding table) because two downstream consumers
share it and AQE's broadcast-join conversion would otherwise remove
the shared Exchange and recompute the expensive map twice.  The
operators return LAZY DataFrames, so they cannot unpersist after the
consuming action themselves — a long-lived session running many such
queries (the 45-query oracle gate, the bench loop) would accumulate
cached blocks for the app lifetime.

`persisted()` registers every such cache; callers that loop over many
queries call `release_cached()` after each query's terminal action.
Unpersisting is always safe: if the returned DataFrame is re-executed
later it silently recomputes.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_LIVE: List[DataFrame] = []


def persisted(df: DataFrame) -> DataFrame:
    """persist() (default MEMORY_AND_DISK) + register for release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_cached() -> int:
    """Unpersist every operator-internal cache registered since the
    last release. Returns how many were released."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
