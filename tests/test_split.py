"""T6 recursive splitter invariants + fixed-input behavior, and T5
page-granular extraction on the reference fixture."""

import os

import pytest

from pdf_parser_spark.functions.split import recursive_split


def test_short_text_single_chunk():
    assert recursive_split("hello world", 1000, 200) == ["hello world"]


def test_paragraph_split():
    text = "para one here.\n\npara two here.\n\npara three here."
    out = recursive_split(text, 20, 5)
    assert all(len(c) <= 20 for c in out)
    assert out[0].startswith("para one")
    joined = " ".join(out)
    for frag in ("para one", "para two", "para three"):
        assert frag in joined


def test_long_single_paragraph_word_split():
    words = " ".join(f"w{i:03d}" for i in range(400))  # 2000 chars
    out = recursive_split(words, 1000, 200)
    assert len(out) >= 2
    assert all(len(c) <= 1000 for c in out)
    # overlap: consecutive chunks share a suffix/prefix region
    assert out[0][-20:] in ("", out[0][-20:])
    tail = out[0].split()[-5:]
    assert any(w in out[1] for w in tail)


def test_unsplittable_run_falls_to_chars():
    text = "x" * 2500
    out = recursive_split(text, 1000, 200)
    assert all(len(c) <= 1000 for c in out)
    assert "".join(out).count("x") >= 2500  # overlap may duplicate


def test_order_preserved():
    text = "\n".join(f"line {i} content here" for i in range(100))
    out = recursive_split(text, 120, 20)
    first_idx = [out.index(c) for c in out]
    assert first_idx == sorted(first_idx)
    assert "line 0" in out[0]
    assert "line 99" in out[-1]


@pytest.mark.skipif(
    not os.path.exists("/root/reference/Snack_planogram_12_05_2025.pdf"),
    reason="reference unavailable",
)
def test_pages_text_df(spark):
    from pdf_parser_spark.functions.split import pages_text_df

    with open("/root/reference/Snack_planogram_12_05_2025.pdf", "rb") as f:
        payload = f.read()
    pages = spark.createDataFrame([("snack", payload)],
                                  "url string, html binary")
    rows = pages_text_df(pages).collect()
    assert len(rows) == 7  # golden num_pages
    assert [r.page_no for r in sorted(rows, key=lambda r: r.page_no)] == list(
        range(1, 8))
    assert all(len(r.page_text) > 100 for r in rows)
