"""Synthetic `pages` table generator (the pipeline's only source).

Schema fixed by BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Mix (FIXTURES.md §1): ~70% synthetic HTML pages, ~25% synthetic
classic-xref PDFs, plus (optionally) the two reference fixture PDFs
verbatim as the byte-identity anchor rows.

Generation is DISTRIBUTED — `spark.range(n)` → `mapInPandas` — so the
same generator that makes 1k test rows would make 10^12 rows on a real
cluster without a driver bottleneck. Determinism: every row derives
only from (seed, id).

Alongside `pages`, an `expected` side table (url, expected_text,
expected_kind) records the ground-truth main text for synthetic rows,
used by tests/bench to verify extraction without re-deriving it.
"""

from __future__ import annotations

import datetime
import os
import random
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from ..functions.clean import clean_text
from .htmlgen import make_html_page
from .pdfgen import build_pdf

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

GEN_SCHEMA = StructType(
    PAGES_SCHEMA.fields
    + [StructField("expected_text", StringType()),
       StructField("expected_kind", StringType())]
)

_EPOCH = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
_LANGS = ["en", "de", "fr", "hi", ""]

FIXTURE_PDFS = {
    "https://fixtures.local/snack_planogram":
        "/root/reference/Snack_planogram_12_05_2025.pdf",
    "https://fixtures.local/rei_8727": "/root/reference/rei-8727.pdf",
}


def _make_pdf_page_lines(rng: random.Random) -> list:
    words = (
        "report total revenue units price margin region quarter item "
        "category stock shelf vendor batch order invoice summary"
    ).split()
    n_lines = rng.randint(8, 25)
    lines = []
    for _ in range(n_lines):
        lines.append(" ".join(rng.choice(words) for _ in range(rng.randint(4, 10))))
    return lines


def make_pdf_doc(seed: int, i: int) -> tuple:
    """(pdf_bytes, expected_clean_text).

    The expectation is the POST-T2-CLEAN document text (the
    byte-identity contract is on cleaned text, like the reference's
    golden JSON): body lines joined '\\n' per page, pages joined
    '\\n', table cells pypdf-style (same-baseline cells ' ', rows
    '\\n'), then `clean_text` applied."""
    rng = random.Random((seed << 21) ^ (i * 2654435761 & 0x7FFFFFFF))
    n_pages = rng.randint(1, 4)
    pages, tables, exp_parts = [], {}, []
    for p in range(n_pages):
        lines = _make_pdf_page_lines(rng)
        pages.append(lines)
        page_exp = "\n".join(lines)
        if rng.random() < 0.35:
            ncols = rng.randint(2, 5)
            nrows = rng.randint(2, 8)
            headers = [f"col{c}" for c in range(ncols)]
            rows = [
                [str(rng.randint(0, 9999)) for _ in range(ncols)]
                for _ in range(nrows)
            ]
            tables[p] = (headers, rows)
            cell_lines = [" ".join(row) for row in [headers] + rows]
            page_exp = page_exp + "\n" + "\n".join(cell_lines)
        exp_parts.append(page_exp)
    info = {"Title": f"synthetic-{i}", "Producer": "pdf_parser_spark-datagen"}
    return build_pdf(pages, tables, info), clean_text("\n".join(exp_parts))


def _gen_batch(ids: pd.Series, seed: int) -> pd.DataFrame:
    rows = []
    for i in ids:
        i = int(i)
        rng = random.Random((seed << 16) ^ i)
        is_pdf = (i % 4) == 3  # 25% PDFs
        if is_pdf:
            payload, expected = make_pdf_doc(seed, i)
            kind = "pdf"
        else:
            payload, expected = make_html_page(seed, i)
            expected = clean_text(expected)
            kind = "html"
        rows.append({
            "url": f"https://example.org/{kind}/{i:08d}",
            "warc_ts": _EPOCH + datetime.timedelta(seconds=i * 137),
            "html": payload,
            "text": expected[:500],
            "lang": _LANGS[i % len(_LANGS)],
            "expected_text": expected,
            "expected_kind": kind,
        })
    return pd.DataFrame(rows)


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    include_fixtures: bool = True,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed deterministic pages+expected DataFrame (GEN_SCHEMA)."""
    partitions = partitions or max(2, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"], seed)

    df = spark.range(0, n, 1, partitions).mapInPandas(gen, GEN_SCHEMA)

    if include_fixtures:
        fx_rows = []
        for url, path in FIXTURE_PDFS.items():
            if os.path.exists(path):
                with open(path, "rb") as f:
                    payload = f.read()
                fx_rows.append((
                    url, _EPOCH, payload, "", "en", None, "fixture_pdf",
                ))
        if fx_rows:
            df = df.unionByName(spark.createDataFrame(fx_rows, GEN_SCHEMA))
    return df


def write_pages(
    spark: SparkSession,
    out_dir: str,
    n: int,
    seed: int = 42,
    include_fixtures: bool = True,
) -> None:
    """Materialize pages.parquet + expected.parquet under out_dir."""
    df = generate_pages(spark, n, seed, include_fixtures).cache()
    df.select(*[f.name for f in PAGES_SCHEMA.fields]).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "pages.parquet"))
    df.select("url", "expected_text", "expected_kind").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "expected.parquet"))
    df.unpersist()
