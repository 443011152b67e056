"""E1/E2 distributed CSV export job: documents → per-table CSV files.

The reference writes one CSV per extracted table next to the parsed
JSON (src/table_extractor.py:406-439 and src/csv_exporter.py:17-61).
At corpus scale that becomes a distributed fan-out: each executor
partition renders and writes its documents' CSVs directly (no driver
collect, no shuffle — file IO is embarrassingly parallel), returning a
small manifest DataFrame (url, filename, n_bytes) for bookkeeping.
Byte-level formatting parity with the reference's pandas writer is
asserted in tests/test_exports_parity.py.
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _base_name(url: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]+", "_", url).strip("_") or "doc"


def write_table_csvs(docs: DataFrame, out_dir: str) -> DataFrame:
    """documents (url, tables_json) → written CSV files + manifest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.exports import export_tables_to_csv

        os.makedirs(out_dir, exist_ok=True)
        for b in batches:
            urls, files, sizes = [], [], []
            for url, tj in zip(b["url"], b["tables_json"]):
                if not tj:
                    continue
                try:
                    tables = json.loads(tj)
                except (TypeError, ValueError):
                    continue
                rendered = export_tables_to_csv(tables, _base_name(url))
                for fname, text in rendered.items():
                    path = os.path.join(out_dir, fname)
                    with open(path, "w", encoding="utf-8-sig",
                              newline="") as f:
                        f.write(text)
                    urls.append(url)
                    files.append(fname)
                    sizes.append(len(text))
            yield pd.DataFrame(
                {"url": urls, "filename": files, "n_bytes": sizes}
            )

    return docs.select("url", "tables_json").mapInPandas(
        run, "url string, filename string, n_bytes long"
    )
