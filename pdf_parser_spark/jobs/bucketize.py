"""Bucketed documents table: pay the id-shuffle ONCE, at write time.

The reference is a per-request app (no table layout to manage); at the
north rule's scale the documents table is joined on `doc_id` by every
downstream consumer — dedup candidate pairs join back for texts,
near-dup clusters join for representative selection, ANN results join
for payloads. Each of those is a shuffle of the FULL documents table
(texts included) if the table is laid out arbitrarily.

Spark's bucketed tables fix this the lakehouse way: write the table
hash-clustered AND sorted by the join key into a fixed bucket count.
Every subsequent equi-join or aggregation on that key reads the
cluster spec from the catalog and skips both the Exchange and (with
sortBy) the Sort on the bucketed side — at 10^12 rows that converts
every downstream id-join from "shuffle 100 TB of text" into a
zipped per-bucket merge. Iceberg expresses the same contract as a
`bucket(N, doc_id)` partition transform + sorted data files; Spark's
storage-partitioned join consumes it identically in production.

Bucketing requires the catalog (`saveAsTable`): the cluster spec
lives in table metadata, which a bare parquet path cannot carry —
this job is catalog-branch only by design (`sources/catalog.py` is
the seam that supplies the catalog in production).

Plan contract (asserted by tests/test_bucketize.py): joining two
tables bucketed by the same key into the same bucket count shows NO
Exchange on either side; a groupBy on the bucket key shows no
Exchange at all.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

#: fixed bucket count for the documents table. At 100 TB the rule is
#: table_bytes / bucket_count ~ a few GB per bucket (splittable into
#: row-groups); the count must match across tables meant to join
#: shuffle-free, so it is a corpus-level constant, not per-job.
DEFAULT_BUCKETS = 64


def bloom_options(
    cols: Sequence[str], ndv_per_file: int = 1_000_000
) -> dict:
    """Parquet writer options enabling a split-block bloom filter on
    each of `cols` (parquet-java's `parquet.bloom.filter.enabled#col`
    per-column form). Bucketing handles equi-JOINS; bloom filters
    handle the other id access pattern — POINT lookups ("show me doc
    X", dedup spot-audits): a `key = literal` predicate skips every
    row group whose filter proves absence, without any sort having
    put the key in min/max-prunable order. `ndv_per_file` sizes the
    bitset (~1.2 MB per row group at 1M NDV / 1% FPP) — at the
    bucketed table's ~few-GB files that is noise next to the scan it
    avoids."""
    opts = {}
    for c in cols:
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{c}"] = str(ndv_per_file)
    return opts


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
    bloom_cols: Optional[Sequence[str]] = None,
    bloom_ndv: int = 1_000_000,
) -> None:
    """Write `df` as a catalog table hash-bucketed (and sorted) by
    `key`. One full shuffle now; zero id-shuffles for every downstream
    join/groupBy on `key` against any same-bucketed table.
    `bloom_cols` additionally writes per-row-group bloom filters for
    point-lookup row-group skipping (see `bloom_options`)."""
    w = df.write.mode(mode)
    if bloom_cols:
        w = w.options(**bloom_options(bloom_cols, bloom_ndv))
    (
        w.bucketBy(buckets, key)
        .sortBy(*(sort_by or [key]))
        .saveAsTable(table)
    )
