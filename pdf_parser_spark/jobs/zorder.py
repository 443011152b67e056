"""Z-order (Morton-curve) clustering writes: multi-dimensional data
skipping for the 100 TB table layout (Morton 1966; the `ZORDER BY` of
Delta/Iceberg `rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(...)')`).

Why: parquet/Iceberg prune scans with per-file and per-row-group
min/max stats, but a table sorted by ONE column only skips for
predicates on that column — a filter on any other dimension reads
everything. Interleaving the bits of two (or more) bounded integer
dimensions into a single sort key makes file boundaries axis-aligned
boxes in dimension space, so range predicates on ANY interleaved
dimension prune files — a box query touches O(perimeter) files
instead of O(all).

Spark-first decomposition: the z-value is a PURE map expression (a
fixed `bits`-step shift/mask/or chain — whole-stage codegen, no UDF,
no extra pass over the data), and the layout is exactly one
`repartitionByRange(z)` (Spark's range partitioner samples
boundaries) + `sortWithinPartitions(z)` + write. Nothing here is
data-dependent state: `rank_bucket` scales with CALLER-SUPPLIED
bounds, so the key is deterministic across runs and cluster sizes and
has a bit-exact DuckDB twin (`zorder_key_sql`) — the same contract as
every operator in this repo. Values outside the declared bounds clamp
to the edge buckets (they cluster at the curve's ends instead of
corrupting the interleave).

Reference parity: none (single-process app, no storage layout); this
is SURVEY.md §2.5 scale scope, same tier as jobs/compact.py and
jobs/bucketize.py.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims x 21 bits = 42-bit keys (bigint-safe;
#: 3 dims at the default still fit: 63 bits).
DEFAULT_BITS = 21


def rank_bucket(
    col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS
) -> Column:
    """Scale a numeric column into the [0, 2^bits) integer grid with
    explicit bounds (no data-dependent min/max pass — deterministic,
    and the twin compares equal bit-for-bit). Out-of-range values
    clamp to the edge buckets."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    n = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo)) * F.lit(n + 1)
    ).cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit(n), scaled))


def rank_bucket_sql(
    col: str, lo: float, hi: float, bits: int = DEFAULT_BITS
) -> str:
    n = (1 << bits) - 1
    scaled = (
        f"CAST(floor((CAST({col} AS DOUBLE) - {float(lo)!r}) / "
        f"{float(hi) - float(lo)!r} * {n + 1}) AS BIGINT)"
    )
    return f"greatest(0, least({n}, {scaled}))"


def zorder_key(
    dims: Sequence[Column], bits: int = DEFAULT_BITS
) -> Column:
    """Morton interleave of 2+ grid coordinates (each already in
    [0, 2^bits), e.g. from :func:`rank_bucket`): bit i of dimension d
    lands at output bit i*ndims + d. A fixed shift/mask/or chain —
    pure codegen, constant-folded per row."""
    ndims = len(dims)
    if ndims < 2:
        raise ValueError("zorder needs >= 2 dimensions")
    if ndims * bits > 63:
        raise ValueError(
            f"{ndims} dims x {bits} bits = {ndims * bits} > 63 key bits"
        )
    parts = []
    for d, col in enumerate(dims):
        c = col.cast("bigint")
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)),
                    i * ndims + d,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z")


def zorder_key_sql(dims: Sequence[str], bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`zorder_key` (same bit layout)."""
    ndims = len(dims)
    parts = []
    for d, col in enumerate(dims):
        c = f"CAST({col} AS BIGINT)"
        for i in range(bits):
            parts.append(f"((({c} >> {i}) & 1) << {i * ndims + d})")
    return " | ".join(parts)


def write_zordered(
    df: DataFrame,
    dims: Sequence[Column],
    path: str,
    n_files: int = 64,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Cluster `df` along the Morton curve of `dims` and write
    `n_files` parquet files: one range Exchange on the z key (Spark
    samples the boundaries, so equal-size files even on skewed
    curves), an in-partition sort, and a stats-tight file per range —
    every interleaved dimension then prunes at read time via the
    parquet min/max footers."""
    keyed = df.withColumn("z", zorder_key(dims, bits))
    (
        keyed.repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode(mode)
        .parquet(path)
    )
