"""T7-T9: OCR with an injectable engine.

The reference shells out to tesseract via pytesseract and rasterizes
via pdf2image/poppler (/root/reference/src/ocr_processor.py).  Neither
binary exists in this environment and OCR output is not deterministic
across tesseract versions, so the engine is INJECTED: the pipeline
logic (T8 per-page loop with error embedding, T9 force-OCR merge) is
real and tested against a deterministic fake engine, and a cluster
deployment plugs a TesseractEngine into the same seam without touching
the pipeline.  Reference semantics preserved:

- per-page errors embed as strings exactly like the reference
  (ocr_processor.py:117-131 "Error processing page {n}: ..."),
- the force-OCR merge (pdf_parser.py:318-332) joins page texts sorted
  by page number with "\\n", then reuses T2 clean + T3 chunk,
- rasterization + OCR run inside the same mapInPandas pass (no extra
  shuffle; page images never leave the executor).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple


class OcrEngine:
    """Engine seam: rasterize a PDF to per-page 'images' and OCR one
    image.  The default engine documents the real binding; tests and
    oracles inject :class:`FakeOcrEngine`."""

    def rasterize(self, payload: bytes, dpi: int = 300) -> List[object]:
        """PDF bytes → list of page images, document page order
        (reference uses pdf2image.convert_from_path at 300 dpi,
        ocr_processor.py:61-83)."""
        raise NotImplementedError(
            "poppler/pdf2image not available in this environment"
        )

    def ocr(self, image: object, lang: str = "eng") -> str:
        """image → text (reference uses pytesseract image_to_string,
        ocr_processor.py:49-59)."""
        raise NotImplementedError(
            "tesseract not available in this environment"
        )


class OcrEngineWithImages(OcrEngine):
    """Extension point for S4 (standalone image files): decode raw
    image bytes into the engine's image type (reference uses
    PIL.Image.open, ocr_processor.py:136-155)."""

    def decode_image(self, payload: bytes) -> object:
        raise NotImplementedError(
            "Pillow not available in this environment"
        )


class FakeOcrEngine(OcrEngineWithImages):
    """Deterministic fake for tests/oracles (same pattern as the
    multimodal fake decode, operators/multimodal.py): 'rasterize'
    parses the PDF with our own from-scratch extractor and yields one
    (page_no, page_text) token per page; 'ocr' returns
    ``"[ocr] " + page_text`` — or raises for injected failure pages so
    the T8 error-embedding path is exercised."""

    def __init__(self, fail_pages: Tuple[int, ...] = ()):
        self.fail_pages = set(fail_pages)

    def rasterize(self, payload: bytes, dpi: int = 300) -> List[object]:
        from ..pdf.document import PdfDocument
        from ..pdf.text import extract_page_text

        doc = PdfDocument(payload)
        return [
            (i + 1, extract_page_text(doc, page))
            for i, page in enumerate(doc.pages())
        ]

    def ocr(self, image: object, lang: str = "eng") -> str:
        page_no, page_text = image
        if page_no in self.fail_pages:
            raise RuntimeError("fake raster decode failure")
        return "[ocr] " + page_text

    def decode_image(self, payload: bytes) -> object:
        # deterministic fake: the 'image' is its utf-8 text content
        # (page_no 1), mirroring the multimodal fake-decode pattern
        return (1, payload.decode("utf-8", errors="replace"))


class TesseractEngine(OcrEngineWithImages):
    """The real binding, constructed only when the libraries exist
    (see :func:`default_engine`): pdf2image/poppler rasterization at
    the reference's 300 dpi (ocr_processor.py:61-83), pytesseract
    image_to_string (:49-59), PIL decode for standalone images
    (:136-155). Imports live inside the methods so the class object
    itself pickles cleanly into executors that DO have the libraries
    installed."""

    def rasterize(self, payload: bytes, dpi: int = 300) -> List[object]:
        import pdf2image

        return pdf2image.convert_from_bytes(payload, dpi=dpi)

    def ocr(self, image: object, lang: str = "eng") -> str:
        import pytesseract

        return pytesseract.image_to_string(image, lang=lang)

    def decode_image(self, payload: bytes) -> object:
        import io

        from PIL import Image

        return Image.open(io.BytesIO(payload))


#: memo for default_engine() — the probe shells out to the tesseract
#: binary, so the per-worker-process answer is cached (one probe per
#: executor Python worker, not one per task/partition)
_PROBE_MEMO: list = []


def default_engine(use_cache: bool = True) -> Optional[OcrEngineWithImages]:
    """Autodetect the real OCR stack: returns a TesseractEngine when
    pytesseract + pdf2image + Pillow are importable AND the tesseract
    binary answers a version probe, else None. Resolution happens
    worker-side (each executor probes its own environment), so a
    cluster with the binaries installed gets real OCR with zero code
    change while this sandbox keeps the injected-engine behavior."""
    if use_cache and _PROBE_MEMO:
        return _PROBE_MEMO[0]
    engine = _probe_engine()
    if use_cache:
        _PROBE_MEMO.clear()
        _PROBE_MEMO.append(engine)
    return engine


def _probe_engine() -> Optional[OcrEngineWithImages]:
    try:
        import pdf2image  # noqa: F401
        import pytesseract
        from PIL import Image  # noqa: F401

        pytesseract.get_tesseract_version()
    except Exception:
        return None
    return TesseractEngine()


def ocr_image_file(payload: bytes, lang: str = "eng",
                   engine: Optional[OcrEngineWithImages] = None) -> str:
    """S4: standalone image file → OCR text (reference
    ocr_processor.py:136-155: Image.open then image_to_string; errors
    propagate to the caller, unlike the per-page T8 embedding)."""
    engine = engine or OcrEngineWithImages()
    return engine.ocr(engine.decode_image(payload), lang)


def rasterize_pdf_pages(payload: bytes, dpi: int = 300,
                        engine: Optional[OcrEngine] = None):
    """T7 seam (kept for API compatibility): delegate to the engine."""
    return (engine or OcrEngine()).rasterize(payload, dpi)


def ocr_image(image, lang: str = "eng",
              engine: Optional[OcrEngine] = None) -> str:
    """T7 seam: image → text via the engine."""
    return (engine or OcrEngine()).ocr(image, lang)


def ocr_pdf(payload: bytes, pages: Optional[List[int]] = None,
            lang: str = "eng",
            engine: Optional[OcrEngine] = None) -> Dict[int, str]:
    """T8: per-page OCR loop with the reference's error-embedding
    semantics (ocr_processor.py:99-134): a failing page contributes
    the string "Error processing page {n}: {err}" instead of raising.
    """
    engine = engine or OcrEngine()
    out: Dict[int, str] = {}
    try:
        images = engine.rasterize(payload)
    except NotImplementedError:
        raise
    except Exception as e:
        return {1: f"Error processing page 1: {e}"}
    for n, img in enumerate(images, start=1):
        if pages is not None and n not in pages:
            continue
        try:
            out[n] = engine.ocr(img, lang)
        except Exception as e:
            out[n] = f"Error processing page {n}: {e}"
    return out


def merge_ocr_text(by_page: Dict[int, str]) -> str:
    """T9: the force-OCR merge (pdf_parser.py:318-332) — page texts
    sorted by page number joined with newlines; the caller then
    applies T2 clean + T3 chunk exactly like the native-text path."""
    return "\n".join(by_page[k] for k in sorted(by_page))
