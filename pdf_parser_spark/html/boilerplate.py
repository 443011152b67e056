"""T10: HTML main-content extraction (boilerplate strip).

The reference app is PDF-only; the north rule (BASELINE.json:6,14)
additionally requires "HTML DOM boilerplate stripping (text-density +
link-density heuristics over a flattened node-array representation)".
There is no reference behavior to match, so THIS implementation is the
frozen spec, golden-tested against deterministic synthetic pages
(tests/test_html_boilerplate.py).

Algorithm (Boilerpipe-style density classification, published in
Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010):

1. Flatten the DOM into an ordered array of text blocks. A block is a
   maximal run of character data between block-level tag boundaries
   (p, div, li, h1..h6, td, br...). For each block record:
   (tag, depth, text, n_chars, n_link_chars, n_words).
2. Per block compute:
     link_density = n_link_chars / n_chars
     text_density = n_words / n_lines  (80-char greedy line wrap)
3. Classify content vs boilerplate with the shallow rule set:
   a block is CONTENT iff link_density <= 1/3 and
     (n_words >= 10  or  (text_density >= 8 and n_words >= 5)
      or (prev or next block is long content, n_words >= 5)).
   Headings (h1..h6) with n_words >= 2 adjacent to content are kept.
4. Main text = "\n".join(content block texts) in document order.

script/style/noscript/template/svg subtrees are dropped wholesale.
The whole thing is pure string logic per document and runs batched
inside the extraction `mapInPandas` pass (no per-row Python UDF).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List

BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "header", "footer", "nav",
    "aside", "ul", "ol", "li", "table", "tr", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "blockquote", "pre", "figure", "figcaption",
    "form", "fieldset", "hr", "br", "body", "title",
}
SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_WS = re.compile(r"\s+")


@dataclass
class Block:
    """One entry of the flattened node array."""

    tag: str
    depth: int
    text: str = ""
    n_link_chars: int = 0
    parts: List[str] = field(default_factory=list)
    link_parts: int = 0

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def n_words(self) -> int:
        return len(self.text.split())

    @property
    def link_density(self) -> float:
        return self.n_link_chars / self.n_chars if self.n_chars else 0.0

    @property
    def text_density(self) -> float:
        # words per 80-char wrapped line, the WSDM'10 shallow feature
        words = self.text.split()
        if not words:
            return 0.0
        lines, cur = 1, 0
        for w in words:
            add = len(w) + (1 if cur else 0)
            if cur + add > 80:
                lines += 1
                cur = len(w)
            else:
                cur += add
        full = max(1, lines - 1) if lines > 1 else 1
        return len(words) / full


class _Flattener(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._cur: Block | None = None
        self._depth = 0
        self._skip = 0
        self._anchor = 0
        self._tag = "body"

    def _flush(self) -> None:
        if self._cur is not None:
            txt = _WS.sub(" ", " ".join(self._cur.parts)).strip()
            if txt:
                self._cur.text = txt
                self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if tag == "a":
            self._anchor += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._tag = tag
        self._depth += 1

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._anchor = max(0, self._anchor - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
        self._depth = max(0, self._depth - 1)

    def handle_data(self, data):
        if self._skip or not data.strip():
            return
        if self._cur is None:
            self._cur = Block(tag=self._tag, depth=self._depth)
        self._cur.parts.append(data)
        if self._anchor:
            self._cur.n_link_chars += len(_WS.sub(" ", data).strip())

    def close(self):
        super().close()
        self._flush()


def flatten_html(html: str) -> List[Block]:
    """HTML → ordered flattened block array (the node-array repr)."""
    p = _Flattener()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # salvage whatever flushed before the parse error
    return p.blocks


def classify_blocks(blocks: List[Block]) -> List[bool]:
    """Per-block content flag per the frozen rule set (module doc §3)."""
    n = len(blocks)
    strong = [
        b.link_density <= 1 / 3 and (b.n_words >= 10 or (b.text_density >= 8 and b.n_words >= 5))
        for b in blocks
    ]
    keep = list(strong)
    for i, b in enumerate(blocks):
        if keep[i]:
            continue
        prev_c = i > 0 and strong[i - 1]
        next_c = i + 1 < n and strong[i + 1]
        if b.link_density <= 1 / 3 and (prev_c or next_c):
            if b.n_words >= 5 or (b.tag in HEADING_TAGS and b.n_words >= 2):
                keep[i] = True
    return keep


def extract_main_text(html: str) -> str:
    """Main content of an HTML page, blocks joined with '\\n'."""
    blocks = flatten_html(html)
    keep = classify_blocks(blocks)
    return "\n".join(b.text for b, k in zip(blocks, keep) if k)
