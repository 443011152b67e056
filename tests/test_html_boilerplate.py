"""T10 golden tests: the extractor must recover the generator's
recorded main text from densities alone (it never sees the record)."""

from pdf_parser_spark.datagen.htmlgen import make_html_page
from pdf_parser_spark.html.boilerplate import (
    classify_blocks, extract_main_text, flatten_html,
)


def test_synthetic_pages_roundtrip():
    for i in range(0, 40):
        html, expected = make_html_page(seed=42, i=i)
        got = extract_main_text(html.decode("utf-8"))
        assert got == expected, f"page {i}"


def test_boilerplate_dropped():
    html, _ = make_html_page(seed=42, i=7)
    got = extract_main_text(html.decode("utf-8"))
    assert "Accept" not in got  # cookie banner
    assert "Copyright" not in got  # footer
    assert "Tags:" not in got  # sidebar
    assert "track()" not in got  # script


def test_flatten_blocks_have_densities():
    html, _ = make_html_page(seed=1, i=0)
    blocks = flatten_html(html.decode("utf-8"))
    assert len(blocks) > 5
    keep = classify_blocks(blocks)
    assert any(keep) and not all(keep)
    nav = [b for b in blocks if b.tag == "li"]
    assert nav and all(b.link_density > 0.9 for b in nav)


def test_malformed_html_no_crash():
    assert extract_main_text("<p>one " * 5) == ""
    assert extract_main_text("") == ""
    long_p = "<p>" + "word " * 30 + "</p>"
    assert extract_main_text(f"<div>{long_p}") .startswith("word word")
