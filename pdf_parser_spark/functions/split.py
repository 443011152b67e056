"""T5/T6: page-granular documents and recursive character splitting.

Re-expressions of the reference's LangChain integration
(/root/reference/src/langchain_parser.py):

- T5 (:45-56): PyPDFLoader.load() → one Document per page.  Spark
  equivalent: per-page text array from the from-scratch extractor +
  posexplode, one row per (url, page_no).
- T6 (:58-74): RecursiveCharacterTextSplitter(["\\n\\n", "\\n", " ",
  ""], chunk_size, chunk_overlap).  The splitter algorithm is public
  and well documented (LangChain docs): recursively split by the
  first separator that appears, re-split oversized pieces with the
  next separator, then greedily merge pieces into chunks of at most
  chunk_size with a chunk_overlap suffix carried between chunks.
  Implemented from that spec (NOT copied); behavior is locked by unit
  tests on fixed inputs + invariants.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_with(text: str, sep: str) -> List[str]:
    if sep:
        return [s for s in text.split(sep) if s != ""]
    return list(text)


def _merge(pieces: List[str], sep: str, chunk_size: int,
           chunk_overlap: int) -> List[str]:
    """Greedy merge with overlap (the public splitter's merge step)."""
    sep_len = len(sep)
    docs: List[str] = []
    cur: List[str] = []
    total = 0
    for p in pieces:
        plen = len(p)
        if total + plen + (sep_len if cur else 0) > chunk_size and cur:
            doc = sep.join(cur).strip()
            if doc:
                docs.append(doc)
            # drop from the front until within overlap budget
            while total > chunk_overlap or (
                    total + plen + (sep_len if cur else 0) > chunk_size
                    and total > 0):
                total -= len(cur[0]) + (sep_len if len(cur) > 1 else 0)
                cur.pop(0)
        cur.append(p)
        total += plen + (sep_len if len(cur) > 1 else 0)
    doc = sep.join(cur).strip()
    if doc:
        docs.append(doc)
    return docs


def recursive_split(text: str, chunk_size: int = 1000,
                    chunk_overlap: int = 200,
                    separators: List[str] = None) -> List[str]:
    """Recursive character splitting per the public LangChain spec."""
    seps = separators if separators is not None else SEPARATORS
    sep = seps[-1]
    next_seps: List[str] = []
    for i, s in enumerate(seps):
        if s == "" or s in text:
            sep = s
            next_seps = seps[i + 1:]
            break
    pieces = _split_with(text, sep)
    good: List[str] = []
    out: List[str] = []
    for p in pieces:
        if len(p) <= chunk_size:
            good.append(p)
        else:
            if good:
                out.extend(_merge(good, sep, chunk_size, chunk_overlap))
                good = []
            if next_seps:
                out.extend(recursive_split(p, chunk_size, chunk_overlap,
                                           next_seps))
            else:
                out.append(p)
    if good:
        out.extend(_merge(good, sep, chunk_size, chunk_overlap))
    return out


def make_recursive_split_udf(chunk_size: int = 1000,
                             chunk_overlap: int = 200):
    @F.pandas_udf(ArrayType(StringType()))
    def split_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: recursive_split(t, chunk_size, chunk_overlap)
            if isinstance(t, str) else []
        )

    return split_udf


# ------------------------------------------------------------------ T5


def pages_text_df(pages: DataFrame) -> DataFrame:
    """T5: one row per (url, page_no, page_text) from PDF payloads —
    the page-granular variant of the extraction pass (posexplode of
    the per-page text array)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pdf.document import PdfDocument
        from ..pdf.text import extract_page_text

        for b in batches:
            urls, texts = [], []
            for url, payload in zip(b["url"], b["html"]):
                ts: List[str] = []
                try:
                    doc = PdfDocument(bytes(payload))
                    for page in doc.pages():
                        try:
                            ts.append(extract_page_text(doc, page))
                        except Exception:
                            ts.append("")
                except Exception:
                    pass
                urls.append(url)
                texts.append(ts)
            yield pd.DataFrame({"url": urls, "page_texts": texts})

    per_doc = pages.select("url", "html").mapInPandas(
        run, "url string, page_texts array<string>"
    )
    return per_doc.select(
        "url",
        F.posexplode("page_texts").alias("page_no", "page_text"),
    ).withColumn("page_no", F.col("page_no") + 1)
