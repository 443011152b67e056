"""Property-based T3 chunker checks (SURVEY §5.2 item 3): for random
paragraph lists, every emitted chunk respects the size bound unless it
is a single oversized paragraph (with at most an overlap-seed prefix),
and paragraph order is preserved."""

from hypothesis import given, settings, strategies as st

from pdf_parser_spark.functions.chunk import chunk_text

PARA = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=300,
).map(lambda s: s.replace("\n", " "))


@settings(max_examples=200, deadline=None)
@given(st.lists(PARA, min_size=0, max_size=12),
       st.integers(50, 400), st.integers(0, 100))
def test_chunk_invariants(paras, size, overlap):
    text = "\n\n".join(paras)
    chunks = chunk_text(text, size, overlap)
    # reconstruction: every non-empty paragraph appears, in order
    joined = "\n\n".join(chunks)
    pos = 0
    for p in paras:
        ps = p.strip()
        if not ps:
            continue
        found = joined.find(ps, pos)
        # overlap seeding may duplicate a suffix, but order holds
        assert found >= 0, (ps, joined)
        pos = found
    # size bound (the reference's own loose bound, pdf_parser.py:186:
    # the check `len(current)+len(para) > size` ignores the '\n\n'
    # joiners and the overlap seed, so a chunk may exceed chunk_size by
    # 2 bytes per merged paragraph plus the overlap-seed prefix; only
    # a single oversized paragraph may blow past that)
    for c in chunks:
        # overlap=0 quirk (faithful to pdf_parser.py:189):
        # current[-0:] slices the WHOLE string, so the next chunk is
        # seeded with the entire previous chunk
        seed = overlap if overlap > 0 else size + 2 * (c.count("\n\n") + 1)
        slack = 2 * (c.count("\n\n") + 1) + seed + 2
        if len(c) > size + slack:
            assert any(p.strip() and p.strip() in c for p in paras
                       if len(p) > size - overlap - 2), (c, size, overlap)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=3000))
def test_single_paragraph_quirk(text):
    """Post-clean text has no blank lines: the verified reference quirk
    is chunks == [] / [text] / ['', text] by length."""
    t = text.replace("\n", " ")
    chunks = chunk_text(t, 1000, 200)
    if not t:
        assert chunks == []
    elif len(t) <= 1000:
        assert chunks == [t.strip()] if t.strip() else chunks in ([], [""])
    else:
        assert chunks == ["", t.strip()]
