"""Document metadata extraction (reference: extract_metadata,
/root/reference/src/pdf_parser.py:142-165).

Returns the trailer /Info entries with the leading slash dropped from
keys (pypdf presents keys as "/Author" etc.; the reference strips it)
plus ``num_pages``.  Values are decoded as PDF text strings; all values
are stringified for the Spark ``map<string,string>`` column.
"""

from __future__ import annotations

from typing import Dict

from .document import PdfDocument, decode_pdf_text_string
from .objects import Name


def extract_metadata(data: bytes) -> Dict[str, str]:
    doc = PdfDocument(data)
    out: Dict[str, str] = {}
    for key, value in doc.info().items():
        v = doc.resolve(value)
        if isinstance(v, (bytes, bytearray)):
            out[str(key)] = decode_pdf_text_string(v)
        elif isinstance(v, Name):
            out[str(key)] = str(v)
        elif v is None:
            out[str(key)] = ""
        else:
            out[str(key)] = str(v)
    out["num_pages"] = str(len(doc.pages()))
    return out
