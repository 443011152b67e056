"""Diagnostic: emulate camelot's RASTER lattice pipeline end-to-end
(render page -> adaptive-ish threshold -> morphological open with
dim/15 kernels -> joints) to locate grid lines the vector pipeline
can't see — specifically the pages-2/6 extra column/row that golden
tables carry.  Probe only; the shipped pipeline stays vector-first.

Usage: python tools/raster_probe.py [page_no ...]
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from pdf_parser_spark.media.codecs import MediaFormatError
from pdf_parser_spark.media.jpeg import jpeg_decode
from pdf_parser_spark.pdf import layout as L
from pdf_parser_spark.pdf.document import PdfDocument

SCALE = 300.0 / 72.0        # px per pt at camelot's 300 dpi


def render_page(doc, page):
    """Grayscale page raster honoring draw order: strokes, near-white
    fills (as white), and decoded images."""
    ex = L._GeomExtractor(doc)
    ex.extract(doc.page_content(page), page.get("Resources"))

    # collect paint events: (seq, kind, payload)
    events = []
    for s in ex.segs:
        events.append((s.seq, "seg", s))
    for r in ex.white_rects:
        events.append((r[0], "white", r[1:]))
    img_cache = {}
    for seq, b, xo, hm in ex.image_paints:
        events.append((seq, "img", (b, xo)))
    events.sort(key=lambda e: e[0])

    # page size from the media box via runs/segs extents is unreliable;
    # use the standard planogram landscape dims (raw device space)
    xs, ys = [], []
    for s in ex.segs:
        xs += [s.x0, s.x1]
        ys += [s.y0, s.y1]
    W = int(np.ceil(max(xs) * SCALE)) + 4
    H = int(np.ceil(max(ys) * SCALE)) + 4
    img = np.full((H, W), 255, dtype=np.uint8)

    def px(v):
        return int(round(v * SCALE))

    for seq, kind, obj in events:
        if kind == "seg":
            s = obj
            x0, x1 = sorted((px(s.x0), px(s.x1)))
            y0, y1 = sorted((px(s.y0), px(s.y1)))
            lum = int(round(s.lum * 255))
            img[max(y0, 0):y1 + 2, max(x0, 0):x1 + 2] = lum
        elif kind == "white":
            x0, y0, x1, y1 = obj
            img[max(px(y0), 0):px(y1) + 1, max(px(x0), 0):px(x1) + 1] = 255
        else:
            (bx0, by0, bx1, by1), xo = obj
            key = id(xo)
            if key not in img_cache:
                try:
                    payload = doc.stream_data(xo)
                    arr = jpeg_decode(payload)
                    if arr.ndim == 3:
                        arr = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                               + 0.114 * arr[..., 2])
                    img_cache[key] = arr.astype(np.uint8)
                except (MediaFormatError, Exception):
                    img_cache[key] = None
            arr = img_cache[key]
            if arr is None:
                continue
            tx0, ty0, tx1, ty1 = px(bx0), px(by0), px(bx1), px(by1)
            th, tw = ty1 - ty0, tx1 - tx0
            if th <= 0 or tw <= 0:
                continue
            # nearest resize; PDF image space is top-down vs device up
            yy = (np.arange(th) * arr.shape[0] // th)[::-1]
            xx = np.arange(tw) * arr.shape[1] // tw
            tile = arr[yy][:, xx]
            y0c, x0c = max(ty0, 0), max(tx0, 0)
            img[y0c:ty1, x0c:tx1] = tile[y0c - ty0:, x0c - tx0:]
    return img


def adaptive_threshold(img, block=15, c=2):
    """camelot image_processing.adaptive_threshold semantics: on the
    INVERTED gray, pixel is foreground iff inv > local_mean(inv) + c
    (OpenCV T = mean - C with camelot's C=-2), i.e. local_mean(gray)
    - gray > c: thin dark lines and blob EDGES survive; uniform
    regions — white background AND large dark interiors — do not.
    Box mean approximates the Gaussian window."""
    a = img.astype(np.float32)
    pad = block // 2
    ap = np.pad(a, pad + 1, mode="edge")
    ii = np.cumsum(np.cumsum(ap, axis=0), axis=1)
    n = block + 1
    s = (ii[n:, n:] - ii[:-n, n:] - ii[n:, :-n] + ii[:-n, :-n])
    mean = s[: a.shape[0], : a.shape[1]] / (n * n)
    return (mean - a) > c


def open_runs(binary, k, axis):
    """Morphological opening with a 1-D kernel of length k along
    `axis`: keep only runs of 1s with length >= k."""
    b = binary if axis == 0 else binary.T
    a = b.astype(np.int8)
    d = np.diff(a, axis=0, prepend=np.zeros((1, a.shape[1]), np.int8),
                append=np.zeros((1, a.shape[1]), np.int8))
    sr, sc = np.where(d == 1)
    er, ec = np.where(d == -1)
    out = np.zeros_like(b, dtype=bool)
    # starts/ends pair up in (col, row) order
    order_s = np.lexsort((sr, sc))
    order_e = np.lexsort((er, ec))
    sr, sc = sr[order_s], sc[order_s]
    er = er[order_e]
    keep = (er - sr) >= k
    for s, e, c in zip(sr[keep], er[keep], sc[keep]):
        out[s:e, c] = True
    return out if axis == 0 else out.T


def main():
    pages = [int(p) for p in sys.argv[1:]] or [1, 2]
    data = open("/root/reference/Snack_planogram_12_05_2025.pdf",
                "rb").read()
    doc = PdfDocument(data)
    for pno in pages:
        page = doc.pages()[pno - 1]
        img = render_page(doc, page)
        binary = adaptive_threshold(img)
        H, W = binary.shape
        kv = H // 15
        kh = W // 15
        vmask = open_runs(binary, kv, 0)
        hmask = open_runs(binary, kh, 1)
        joints = vmask & hmask
        ys, xs = np.where(joints)
        if len(xs) == 0:
            print(f"page {pno}: no joints")
            continue
        # cluster joint coordinates (tol ~ 2pt)
        def cluster(vals, tol=2.0 * SCALE):
            out = []
            for v in np.sort(vals):
                if out and v - out[-1][-1] <= tol:
                    out[-1].append(v)
                else:
                    out.append([v])
            return [float(np.mean(c)) / SCALE for c in out]

        cx = cluster(xs.astype(float))
        cy = cluster(ys.astype(float))
        print(f"page {pno}: joint x clusters (pt): "
              f"{[round(v, 1) for v in cx]}")
        print(f"page {pno}: joint y clusters (pt): "
              f"{[round(v, 1) for v in cy]}")


if __name__ == "__main__":
    main()
