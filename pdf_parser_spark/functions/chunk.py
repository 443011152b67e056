"""T3 chunking: greedy paragraph packing with character overlap.

Reference semantics (/root/reference/src/pdf_parser.py:167-205):
split on '\\n\\n'; pack paragraphs while len(current)+len(para) <=
chunk_size; on overflow emit current (stripped) and seed the next chunk
with the last `chunk_overlap` chars + '\\n\\n' + para; finally emit the
remainder if non-empty.

Verified quirk (reproduced byte-exact against
exports/Snack_planogram_12_05_2025_parsed.json): cleaned text contains
no '\\n\\n', so a document longer than chunk_size yields ['', text] —
the first append fires with current_chunk == '' (condition is `>`, and
len('')+len(text) > size), and since len('') <= overlap the next chunk
seeds with the full paragraph.

Spark-side this is a scalar pandas UDF (Arrow-batched) returning
array<string>; the algorithm is pure string logic per document.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def chunk_text(text: str, chunk_size: int = 1000, chunk_overlap: int = 200) -> List[str]:
    paragraphs = text.split("\n\n")
    chunks: List[str] = []
    current = ""
    for para in paragraphs:
        if len(current) + len(para) > chunk_size:
            chunks.append(current.strip())
            if len(current) > chunk_overlap:
                current = current[-chunk_overlap:] + "\n\n" + para
            else:
                current = para
        else:
            if current:
                current += "\n\n" + para
            else:
                current = para
    if current:
        chunks.append(current.strip())
    return chunks


def make_chunk_udf(chunk_size: int = 1000, chunk_overlap: int = 200):
    """Arrow-batched pandas UDF: text column -> array<string> chunks."""

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: chunk_text(t, chunk_size, chunk_overlap) if isinstance(t, str) else []
        )

    return chunk_udf


def num_chunks(text_len: int, chunk_size: int = 1000) -> int:
    """Chunk count for single-paragraph text (post-clean text has no
    '\\n\\n'), used by SQL oracles: 0 if empty, 2 if len>size else 1."""
    if text_len == 0:
        return 0
    return 2 if text_len > chunk_size else 1
