"""Boilerplate removal — main-text extraction from page HTML.

The standard first step of a web-text training pipeline: split the page
into text blocks at block-level tag boundaries, then keep content-like
blocks by the classic link-density heuristic (cf. Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010 — the
shipped rule is the deterministic integer core of it):

    keep block ⇔ len(block_text) >= min_chars
                 AND 3 * link_chars <= total_chars      (density ≤ 1/3)

Both predicates are INTEGER comparisons, so the op is exactly
reproducible across engines (the driver oracle re-derives expectations
from constructed pages). ``<script>``/``<style>`` content never counts as
text; anchor text counts toward both totals but inflates link_chars,
which is what sinks nav bars, footers and tag clouds.

Spark integration: one Arrow-batched pandas UDF over the pages table —
no shuffle at all; at 100 TB this is a pure map stage whose cost is the
HTML scan itself.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RX_WS = re.compile(r"\s+")

# tags whose boundaries delimit text blocks
_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 td th tr table article section "
    "header footer nav aside blockquote pre br title body html form".split()
)
_SKIP_TAGS = frozenset(("script", "style", "noscript"))


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: List[Tuple[str, int, int]] = []  # (text, link_chars, chars)
        self._buf: List[str] = []
        self._link_chars = 0
        self._a_depth = 0
        self._skip_depth = 0

    def _flush(self):
        text = _RX_WS.sub(" ", "".join(self._buf)).strip()
        if text:
            self.blocks.append((text, self._link_chars, len(text)))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._a_depth:
            # whitespace-collapsed length approximation: count the
            # collapsed form so densities are consistent with block text
            self._link_chars += len(_RX_WS.sub(" ", data).strip())

    def close(self):
        super().close()
        self._flush()


def text_blocks(html: bytes | str | None) -> List[Tuple[str, int, int]]:
    """(block_text, link_chars, total_chars) per block, document order."""
    p = _BlockParser()
    if html is None:
        return []
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001
        p._flush()
    return p.blocks


def main_text_of(html: bytes | str | None, min_chars: int = 20) -> Tuple[str, int, int]:
    """(main_text, n_blocks, n_kept): kept blocks joined by newline."""
    blocks = text_blocks(html)
    kept = [
        t for t, link_chars, chars in blocks
        if chars >= min_chars and 3 * link_chars <= chars
    ]
    return "\n".join(kept), len(blocks), len(kept)


MAIN_TEXT_SCHEMA = (
    "url string, main_text string, n_blocks int, n_kept int, main_len int"
)


def extract_main_text(pages: DataFrame, min_chars: int = 20) -> DataFrame:
    """pages(url, html) → (url, main_text, n_blocks, n_kept, main_len)."""

    def batches(it):
        for pdf in it:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                txt, n_blocks, n_kept = main_text_of(
                    bytes(html) if html is not None else None, min_chars
                )
                rows.append(dict(url=url, main_text=txt, n_blocks=n_blocks,
                                 n_kept=n_kept, main_len=len(txt)))
            yield pd.DataFrame(
                rows, columns=["url", "main_text", "n_blocks", "n_kept",
                               "main_len"],
            )

    return pages.select("url", "html").mapInPandas(
        batches, schema=MAIN_TEXT_SCHEMA
    )
