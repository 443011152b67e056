"""T7-T9: OCR interface seams (deferred scope, SURVEY §7.5).

The reference shells out to tesseract via pytesseract and rasterizes
via pdf2image/poppler (/root/reference/src/ocr_processor.py).  Neither
binary exists in this environment and OCR output is not deterministic
across tesseract versions, so the reference's golden-verified path is
`ocr_used=false` (both fixture goldens) — which the pipeline already
produces.  This module pins the INTERFACE so the cluster deployment
can plug real engines in without touching the pipeline:

- per-page rasterization and OCR run inside the same mapInPandas pass
  (no extra shuffle; page images never leave the executor),
- per-page errors embed as strings exactly like the reference
  (ocr_processor.py:117-131 "Error processing page {n}: ..."),
- the force-OCR merge (pdf_parser.py:318-332) joins page texts sorted
  by page number with "\\n", then reuses T2 clean + T3 chunk.
"""

from __future__ import annotations

from typing import Dict, List, Optional


def rasterize_pdf_pages(payload: bytes, dpi: int = 300,
                        pages: Optional[List[int]] = None):
    """T7 seam: PDF bytes → per-page images (reference uses
    pdf2image.convert_from_path at 300 dpi, ocr_processor.py:61-83)."""
    raise NotImplementedError(
        "poppler/pdf2image not available in this environment"
    )


def ocr_image(image, lang: str = "eng") -> str:
    """T7 seam: image → text (reference uses pytesseract
    image_to_string, ocr_processor.py:49-59)."""
    raise NotImplementedError("tesseract not available in this environment")


def ocr_pdf(payload: bytes, pages: Optional[List[int]] = None,
            lang: str = "eng") -> Dict[int, str]:
    """T8: per-page OCR loop with the reference's error-embedding
    semantics (ocr_processor.py:99-134): a failing page contributes
    the string "Error processing page {n}: {err}" instead of raising.
    """
    out: Dict[int, str] = {}
    try:
        images = rasterize_pdf_pages(payload)
    except NotImplementedError:
        raise
    except Exception as e:  # pragma: no cover - engine-specific
        return {1: f"Error processing page 1: {e}"}
    for n, img in enumerate(images, start=1):
        if pages is not None and n not in pages:
            continue
        try:
            out[n] = ocr_image(img)
        except Exception as e:  # pragma: no cover - engine-specific
            out[n] = f"Error processing page {n}: {e}"
    return out


def merge_ocr_text(by_page: Dict[int, str]) -> str:
    """T9: the force-OCR merge (pdf_parser.py:318-332) — page texts
    sorted by page number joined with newlines; the caller then
    applies T2 clean + T3 chunk exactly like the native-text path."""
    return "\n".join(by_page[k] for k in sorted(by_page))
