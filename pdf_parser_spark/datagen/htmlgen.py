"""Deterministic synthetic Common-Crawl-style HTML pages.

Each page is boilerplate (nav/sidebar/footer link lists, cookie
banner, script/style junk) wrapped around a main article whose
paragraphs the generator RECORDS — the expected main text is returned
alongside the markup, making every generated page a golden test for
the T10 boilerplate extractor (the extractor never sees the
expectation; it must recover it from densities alone).

Seeded `random.Random` only — same (seed, i) → same bytes forever.
"""

from __future__ import annotations

import random
from typing import List, Tuple

_WORDS = (
    "data spark table query join filter scan shuffle partition batch "
    "document text page content extract chunk token stream byte vector "
    "column row value hash index merge sort window count language model "
    "crawl parse engine plan stage task executor memory disk network"
).split()

_NAV = ["Home", "About", "Products", "Blog", "Contact", "Careers", "Login",
        "Register", "Pricing", "Docs", "Support", "Terms", "Privacy"]


def _sentence(rng: random.Random, lo: int = 8, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 6) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def make_html_page(seed: int, i: int) -> Tuple[bytes, str]:
    """Return (html_bytes, expected_main_text).

    expected_main_text is what T10 must produce for this page: the
    heading plus article paragraphs, '\\n'-joined, whitespace-normalized
    exactly as the flattener normalizes (single spaces).
    """
    rng = random.Random((seed << 20) ^ i)
    title = _sentence(rng, 3, 6).rstrip(".")
    n_paras = rng.randint(3, 9)
    paras: List[str] = [_paragraph(rng) for _ in range(n_paras)]

    nav_links = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>' for w in rng.sample(_NAV, 7)
    )
    side_links = "".join(
        f'<a href="/tag/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a> | '
        for _ in range(10)
    )
    footer_links = " ".join(
        f'<a href="/f/{w.lower()}">{w}</a>' for w in rng.sample(_NAV, 5)
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = f"""<!DOCTYPE html>
<html><head><title>{title}</title>
<style>body {{ margin: 0; }} .x{i % 7} {{ color: red }}</style>
<script>var page = {i}; function track() {{ return {rng.randint(0, 9999)}; }}</script>
</head>
<body>
<header><nav><ul>{nav_links}</ul></nav></header>
<div class="cookie-banner">We use cookies. <a href="/cookies">Learn more</a> <a href="/accept">Accept</a></div>
<aside class="sidebar">Tags: {side_links}</aside>
<main>
<article>
<h1>{title}</h1>
{body_paras}
</article>
</main>
<footer><p>{footer_links}</p><p>Copyright {1990 + i % 30} Example Corp</p></footer>
<script>track();</script>
</body></html>"""
    expected = "\n".join([title] + paras)
    return html.encode("utf-8"), expected
