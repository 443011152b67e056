"""Unit + property tests for T2 clean and T3 chunk (pure functions).

Oracle for the property test is a literal port of the reference
algorithm (/root/reference/src/pdf_parser.py:121-140,167-205) executed
in-test; our implementation must agree on random inputs.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.functions.chunk import chunk_text, num_chunks
from pdf_parser_spark.functions.clean import clean_text


def _ref_clean(text):  # literal reference oracle
    text = re.sub(r"\n+", "\n", text)
    text = re.sub(r" +", " ", text)
    text = re.sub(r"[^\x00-\x7F]+", "", text)
    return text.strip()


def _ref_chunk(text, chunk_size=1000, chunk_overlap=200):  # literal oracle
    paragraphs = text.split("\n\n")
    chunks = []
    current_chunk = ""
    for para in paragraphs:
        if len(current_chunk) + len(para) > chunk_size:
            chunks.append(current_chunk.strip())
            if len(current_chunk) > chunk_overlap:
                current_chunk = current_chunk[-chunk_overlap:] + "\n\n" + para
            else:
                current_chunk = para
        else:
            if current_chunk:
                current_chunk += "\n\n" + para
            else:
                current_chunk = para
    if current_chunk:
        chunks.append(current_chunk.strip())
    return chunks


def test_clean_collapses_newlines_and_spaces():
    assert clean_text("a\n\n\nb") == "a\nb"
    assert clean_text("a    b") == "a b"
    # tabs are NOT collapsed (the reference collapses spaces only)
    assert clean_text("a\t\tb") == "a\t\tb"


def test_clean_strips_non_ascii():
    # space collapsing runs BEFORE non-ASCII stripping, so removing a
    # non-ASCII run between spaces leaves a double space (reference
    # quirk, src/pdf_parser.py:131-138 order)
    assert clean_text("café → bar \U0001f600") == "caf  bar"


def test_clean_strips_ends():
    assert clean_text("  \n x \n  ") == "x"


def test_chunk_short_text_single_chunk():
    assert chunk_text("hello world") == ["hello world"]


def test_chunk_empty_text():
    assert chunk_text("") == []


def test_chunk_oversized_single_paragraph_quirk():
    text = "x" * 8527
    assert chunk_text(text) == ["", text]
    assert num_chunks(len(text)) == 2


def test_chunk_multi_paragraph_overlap():
    paras = ["a" * 600, "b" * 600, "c" * 600]
    text = "\n\n".join(paras)
    got = chunk_text(text)
    assert got == _ref_chunk(text)
    # first chunk is the first paragraph; second seeds with 200-char overlap
    assert got[0] == "a" * 600
    assert got[1].startswith("a" * 200 + "\n\n" + "b" * 600)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab \né", max_size=400))
def test_clean_matches_reference(s):
    assert clean_text(s) == _ref_clean(s)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(alphabet="xy z", min_size=0, max_size=300), max_size=8),
    st.integers(min_value=10, max_value=150),
    st.integers(min_value=0, max_value=60),
)
def test_chunk_matches_reference(paras, size, overlap):
    text = "\n\n".join(paras)
    assert chunk_text(text, size, overlap) == _ref_chunk(text, size, overlap)
