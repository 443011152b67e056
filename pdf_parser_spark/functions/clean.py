"""T2 text cleaning as a native Spark column expression.

Reference semantics (/root/reference/src/pdf_parser.py:121-140), order
preserved exactly:
  1. ``\\n+``       -> ``\\n``
  2. `` +`` (spaces, not tabs) -> `` ``
  3. ``[^\\x00-\\x7F]+``        -> `` `` (strip non-ASCII)
  4. Python ``str.strip()``     (all whitespace at both ends)

All four steps run JVM-side (regexp_replace), so the whole clean stays
inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_text_col(col: Column) -> Column:
    c = F.regexp_replace(col, r"\n+", "\n")
    c = F.regexp_replace(c, r" +", " ")
    c = F.regexp_replace(c, r"[^\x00-\x7F]+", "")
    # Python str.strip() strips all whitespace, not just ' ' (trim()):
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    return c


def clean_text(text: str) -> str:
    """Pure-Python twin of :func:`clean_text_col` (used inside pandas
    UDF pipelines and in tests as the oracle)."""
    text = re.sub(r"\n+", "\n", text)
    text = re.sub(r" +", " ", text)
    text = re.sub(r"[^\x00-\x7F]+", "", text)
    return text.strip()


#: DuckDB/ANSI-SQL equivalent, for __spark_entry__.oracle_sql entries.
CLEAN_SQL_TEMPLATE = (
    "trim(regexp_replace(regexp_replace(regexp_replace({col}, '\\n+', '\\n', 'g'),"
    " ' +', ' ', 'g'), '[^\\x00-\\x7F]+', '', 'g'))"
)
