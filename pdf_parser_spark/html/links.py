"""Hyperlink + head-metadata extraction from HTML pages.

The crawl-graph tier every web-scale corpus pipeline needs and the
reference app (a per-request parser, `src/pdf_processor.py` /
`src/csv_exporter.py`) has no counterpart for: outlink edges feed
URL frontier / PageRank-style quality signals, anchor text is a
classic relevance signal, and `<meta name="robots">` / canonical
links drive indexability filtering (the public CCNet/C4/RefinedWeb
recipes all key on these).

Parsing uses the same stdlib-`HTMLParser` salvage discipline as the
boilerplate stripper (`html/boilerplate.py`): malformed markup keeps
whatever flushed before the error, never raises. Resolution follows
RFC 3986 via `urllib.parse.urljoin` (the spec implementation), with
a documented scheme filter: only ``http(s)`` results survive;
``javascript:``, ``mailto:``, ``tel:``, ``data:`` and fragment-only
hrefs are dropped at the source.

Spark-side operators over these functions live in
`operators/graph.py` (Arrow-batched `mapInPandas`; the per-row work
here is pure Python over one page's bytes — the honest slow path,
same shape as text extraction).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional
from urllib.parse import urljoin

import re

_WS = re.compile(r"\s+")

#: href schemes (or shapes) that are not crawlable links.
_DROP_PREFIXES = ("javascript:", "mailto:", "tel:", "data:", "about:")


@dataclass
class Link:
    href: str
    anchor: str = ""
    nofollow: bool = False
    parts: List[str] = field(default_factory=list)


@dataclass
class PageLinks:
    links: List[Link] = field(default_factory=list)
    base: Optional[str] = None          # first <base href>
    title: Optional[str] = None         # first <title> text
    description: Optional[str] = None   # <meta name="description">
    canonical: Optional[str] = None     # <link rel="canonical"> href (raw)
    robots: str = ""                    # <meta name="robots"> content

    @property
    def robots_noindex(self) -> bool:
        return "noindex" in self.robots

    @property
    def robots_nofollow(self) -> bool:
        return "nofollow" in self.robots


class _LinkCollector(HTMLParser):
    """One pass: anchors (href/rel/visible text) + head metadata.

    Nested/unclosed ``<a>`` tags follow browser behavior: an opening
    ``<a>`` implicitly closes a pending one (nested anchors are
    invalid HTML and the HTML5 tree builder splits them).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.page = PageLinks()
        self._open: Optional[Link] = None
        self._in_title = False

    def _flush_anchor(self) -> None:
        if self._open is not None:
            self._open.anchor = _WS.sub(" ", " ".join(self._open.parts)).strip()
            self._open.parts = []
            self.page.links.append(self._open)
        self._open = None

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        a = {k.lower(): (v or "") for k, v in attrs}
        if tag == "a":
            self._flush_anchor()
            if a.get("href", "").strip():
                rel = a.get("rel", "").lower()
                self._open = Link(
                    href=a["href"].strip(),
                    nofollow="nofollow" in rel.split(),
                )
        elif tag == "base" and self.page.base is None and a.get("href"):
            self.page.base = a["href"].strip()
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            name = a.get("name", "").lower()
            if name == "robots" and not self.page.robots:
                self.page.robots = a.get("content", "").lower()
            elif name == "description" and self.page.description is None:
                self.page.description = a.get("content", "")
        elif tag == "link":
            rel = a.get("rel", "").lower()
            if "canonical" in rel.split() and self.page.canonical is None:
                if a.get("href", "").strip():
                    self.page.canonical = a["href"].strip()

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == "a":
            self._flush_anchor()
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._open is not None:
            self._open.parts.append(data)
        if self._in_title and self.page.title is None and data.strip():
            self.page.title = _WS.sub(" ", data).strip()

    def close(self):
        super().close()
        self._flush_anchor()


def parse_page_links(html: str) -> PageLinks:
    """HTML → anchors + head metadata; salvages on malformed markup."""
    c = _LinkCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        c._flush_anchor()  # keep whatever flushed before the error
    return c.page


def resolve_href(page_url: str, href: str,
                 base_tag: Optional[str] = None) -> Optional[str]:
    """Absolute http(s) URL for ``href`` on the page at ``page_url``,
    or ``None`` when the href is not a crawlable link (empty,
    fragment-only, or a non-web scheme). ``base_tag`` is the page's
    ``<base href>`` — itself resolved against the page URL first, per
    the HTML spec."""
    h = href.strip()
    if not h or h.startswith("#"):
        return None
    low = h.lower()
    if any(low.startswith(p) for p in _DROP_PREFIXES):
        return None
    base = urljoin(page_url, base_tag.strip()) if base_tag else page_url
    try:
        out = urljoin(base, h)
    except ValueError:
        return None
    if not (out.startswith("http://") or out.startswith("https://")):
        return None
    return out
