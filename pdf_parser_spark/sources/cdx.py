"""CDX(J) index source — Common Crawl's URL index format.

Each crawl ships a CDX-JSON index (`cc-index`): one line per capture,
``<surt-key> <14-digit-timestamp> <json-blob>``, where the JSON block
carries url / mime / status / digest / length / offset / filename
(all JSON strings, per the public pywb CDXJ spec). Pipelines use the
index to plan fetches (which WARC file + byte range holds a URL)
WITHOUT touching payload bytes — at 10^12 rows the index is the only
full-corpus table many jobs ever scan.

Spark-first: the line split and JSON decode are fully NATIVE
(``split`` limit-3 + ``from_json``; whole-stage codegen, no Python),
so a CDX scan is a free map pass with column pruning — reading only
(surt, status) for a dedup-planning query never decodes the rest.

Reference parity: none (the reference has no crawl tier); format per
the public pywb/webarchive CDXJ documentation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: JSON fields of a CDXJ capture line (all strings on the wire).
CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def parse_cdx(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ lines → typed capture table.

    Output: surt, fetch_unix (epoch seconds of the 14-digit
    timestamp), url, mime, status int, length/offset bigint,
    filename. Malformed JSON yields nulls in the JSON-derived
    columns (``from_json`` null semantics) — row-level containment,
    the line itself survives for inspection.
    """
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(F.get(parts, 2), CDX_JSON_SCHEMA)
    ts14 = F.get(parts, 1)
    # CDX timestamps are UTC by spec. The epoch is computed
    # ARITHMETICALLY (DateType days since 1970-01-01 + h/m/s fields)
    # rather than via to_timestamp/unix_timestamp, which interpret the
    # naive string in spark.sql.session.timeZone — a non-UTC session
    # would silently shift every fetch_unix. DateType carries no zone,
    # so this expression is session-TZ-independent (pinned by
    # tests/test_cdx.py::test_fetch_unix_tz_independent).
    fetch_unix = F.when(
        ts14.rlike(r"^[0-9]{14}$"),
        F.datediff(
            F.to_date(F.substring(ts14, 1, 8), "yyyyMMdd"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint") * 86400
        + F.substring(ts14, 9, 2).cast("bigint") * 3600
        + F.substring(ts14, 11, 2).cast("bigint") * 60
        + F.substring(ts14, 13, 2).cast("bigint"),
    )  # non-14-digit timestamp → NULL (row-level containment)
    return lines.select(
        F.get(parts, 0).alias("surt"),
        fetch_unix.alias("fetch_unix"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["length"].cast("bigint").alias("length"),
        j["offset"].cast("bigint").alias("offset"),
        j["filename"].alias("filename"),
    )


def fetch_plan(captures: DataFrame) -> DataFrame:
    """Captures → per-WARC-file fetch plan: which files to read and
    the byte span that covers the wanted records — the scan-planning
    aggregation a targeted re-fetch job runs BEFORE touching any
    payload. ONE partial-agg shuffle on filename."""
    ok = captures.where(F.col("status") == 200)
    return ok.groupBy("filename").agg(
        F.count("*").alias("n_records"),
        F.min("offset").alias("min_offset"),
        F.max(F.col("offset") + F.col("length")).alias("end_offset"),
        F.sum("length").alias("total_bytes"),
    )


def latest_capture(captures: DataFrame,
                   key: Column | str = "surt") -> DataFrame:
    """One row per URL key: the most recent 200 capture (max
    fetch_unix, ties broken by filename/offset bytewise so the pick
    is deterministic). The window's ``row_number <= 1`` filter plans
    WindowGroupLimit — per-partition pre-prune before the Exchange."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(
        F.desc("fetch_unix"), F.asc("filename"), F.asc("offset")
    )
    return (
        captures.where(F.col("status") == 200)
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") == 1)
        .drop("pos")
    )
