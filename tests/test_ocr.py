"""T7-T9 OCR family against the injectable deterministic fake engine
(reference /root/reference/src/ocr_processor.py:99-134 error-embedding
loop, src/pdf_parser.py:318-332 force-OCR merge branch)."""

import pytest

from pdf_parser_spark.datagen.pdfgen import build_pdf
from pdf_parser_spark.operators.ocr import (
    FakeOcrEngine, OcrEngine, merge_ocr_text, ocr_pdf,
)

PDF3 = build_pdf(
    [["alpha one"], ["beta two"], ["gamma three"]], {}, {"Title": "t"}
)


def test_ocr_happy_path_page_order():
    by_page = ocr_pdf(PDF3, engine=FakeOcrEngine())
    assert sorted(by_page) == [1, 2, 3]
    assert by_page[1] == "[ocr] alpha one\n"
    assert by_page[3] == "[ocr] gamma three\n"
    merged = merge_ocr_text(by_page)
    # T9: page texts sorted by page number, '\n'-joined
    assert merged.index("alpha") < merged.index("beta") < merged.index("gamma")


def test_ocr_error_embedding_string():
    # ocr_processor.py:117-131: a failing page contributes the literal
    # "Error processing page {n}: ..." string instead of raising
    by_page = ocr_pdf(PDF3, engine=FakeOcrEngine(fail_pages=(2,)))
    assert by_page[1] == "[ocr] alpha one\n"
    assert by_page[2] == (
        "Error processing page 2: fake raster decode failure"
    )
    assert by_page[3] == "[ocr] gamma three\n"
    merged = merge_ocr_text(by_page)
    assert "Error processing page 2:" in merged


def test_ocr_pages_subset():
    by_page = ocr_pdf(PDF3, pages=[1, 3], engine=FakeOcrEngine())
    assert sorted(by_page) == [1, 3]


def test_ocr_image_file_s4():
    from pdf_parser_spark.operators.ocr import (
        OcrEngineWithImages, ocr_image_file,
    )

    assert ocr_image_file(b"photo text", engine=FakeOcrEngine()) == \
        "[ocr] photo text"
    with pytest.raises(NotImplementedError):
        ocr_image_file(b"x", engine=OcrEngineWithImages())
    # S4 errors PROPAGATE (no per-page embedding on the image path)
    with pytest.raises(RuntimeError):
        ocr_image_file(b"x", engine=FakeOcrEngine(fail_pages=(1,)))


def test_default_engine_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        ocr_pdf(PDF3, engine=OcrEngine())
    with pytest.raises(NotImplementedError):
        ocr_pdf(PDF3)  # engine=None → default seam


def test_force_ocr_pipeline(spark):
    from pdf_parser_spark.jobs.extract import extract_documents

    rows = [
        ("pdf-ok", bytearray(build_pdf([["hello world"], ["second page"]],
                                       {}, {"Title": "a"}))),
        ("pdf-fail", bytearray(build_pdf([["first"], ["will fail"]],
                                         {}, {"Title": "b"}))),
        ("html-1", b"<html><body><main><article><p>"
                   b"plain web page text here</p></article></main>"
                   b"</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")

    class FailSecond(FakeOcrEngine):
        def ocr(self, image, lang="eng"):
            page_no, _ = image
            if page_no == 2:
                raise RuntimeError("boom")
            return super().ocr(image, lang)

    out = {
        r.url: r
        for r in extract_documents(
            pages, partitions=2, force_ocr=True, ocr_engine=FailSecond()
        ).collect()
    }
    ok = out["pdf-ok"]
    # FailSecond fails page 2 of every pdf: the error string embeds,
    # page 1 OCR text survives
    assert ok.ocr_used is True
    assert ok.ocr_text.startswith("[ocr] hello world")
    assert "Error processing page 2: boom" in ok.ocr_text
    assert ok.ocr_by_page["1"] == "[ocr] hello world\n"
    assert ok.ocr_num_chunks == 1
    assert ok.ocr_error is None
    # native text extraction unaffected by the force-OCR branch
    assert ok.text == "hello world\nsecond page"
    html = out["html-1"]
    assert html.ocr_used is False
    assert html.ocr_text is None and html.ocr_by_page is None


def test_force_ocr_engine_unavailable_degrades(spark):
    # pdf_parser.py:331-332: an OCR engine failure records ocr_error
    # and the document still extracts natively
    from pdf_parser_spark.jobs.extract import extract_documents

    rows = [("u1", bytearray(build_pdf([["native text"]], {}, {})))]
    pages = spark.createDataFrame(rows, "url string, html binary")
    r = extract_documents(
        pages, partitions=1, force_ocr=True, ocr_engine=OcrEngine()
    ).collect()[0]
    assert r.text == "native text"
    assert r.ocr_text is None
    assert "not available" in r.ocr_error


# ------------------------------------------------ binding autodetect

def test_default_engine_contract():
    # In any environment: None (stack absent) or a full
    # OcrEngineWithImages (stack present) — never a partial binding.
    from pdf_parser_spark.operators.ocr import (
        OcrEngineWithImages, default_engine,
    )

    eng = default_engine(use_cache=False)
    assert eng is None or isinstance(eng, OcrEngineWithImages)
    # memoized path answers the same
    assert type(default_engine()) is type(eng)


def test_force_ocr_autodetect_degrades_without_stack(spark):
    """force_ocr with NO injected engine resolves worker-side: on a
    machine without the tesseract stack the document still extracts
    natively and carries ocr_error (identical to the explicit-seam
    behavior above); on a machine WITH the stack it would OCR for
    real — test_real_tesseract_roundtrip covers that half."""
    from pdf_parser_spark.jobs.extract import extract_documents
    from pdf_parser_spark.operators.ocr import default_engine

    if default_engine(use_cache=False) is not None:
        pytest.skip("real OCR stack installed — degrade path n/a here")
    rows = [("u1", bytearray(build_pdf([["native text"]], {}, {})))]
    pages = spark.createDataFrame(rows, "url string, html binary")
    r = extract_documents(pages, partitions=1, force_ocr=True).collect()[0]
    assert r.text == "native text"
    assert r.ocr_text is None
    assert "not available" in r.ocr_error


@pytest.mark.skipif(
    __import__("pdf_parser_spark.operators.ocr", fromlist=["default_engine"])
    .default_engine(use_cache=False) is None,
    reason="pytesseract/pdf2image/Pillow + tesseract binary not installed",
)
def test_real_tesseract_roundtrip(spark):
    """Integration half of the autodetect (runs only where the real
    stack exists): force_ocr with no injected engine must produce real
    per-page OCR text through the unchanged pipeline."""
    from pdf_parser_spark.jobs.extract import extract_documents

    rows = [("u1", bytearray(build_pdf([["HELLO OCR"]], {}, {})))]
    pages = spark.createDataFrame(rows, "url string, html binary")
    r = extract_documents(pages, partitions=1, force_ocr=True).collect()[0]
    assert r.ocr_error is None
    assert r.ocr_by_page and "1" in r.ocr_by_page
    assert r.ocr_text is not None
