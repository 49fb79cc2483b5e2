"""Link extraction — the ``a[href]`` scan of the reference.

The reference uses goquery's CSS selector ``doc.Find("a[href]")`` in
document order, takes the raw ``href`` attribute and the whitespace-trimmed
text content of the anchor (/root/reference/job.go:816-825).

No HTML parser library ships in this sandbox (lxml/selectolax/bs4 absent),
so extraction is a strict regex scanner over the fixture-HTML contract
(FIXTURES.md): anchors are written as ``<a ... href="...">inner</a>`` with
double-quoted hrefs and no nested anchors. For that subset the scanner is
exactly goquery-equivalent: document order, raw href value, text content
with inner tags stripped and TrimSpace applied. On a production cluster the
body of ``extract_links`` would swap to selectolax with the same signature.

Spark integration: Arrow-batched pandas UDF returning
``array<struct<href:string, anchor:string>>`` which callers ``posexplode``
to get the per-page link index (the discovery-order tiebreak).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd

# Document-order anchor scanner for the fixture-HTML subset.
_RX_ANCHOR = re.compile(
    rb'<a\s[^>]*?href="([^"]*)"[^>]*>(.*?)</a>',
    re.DOTALL | re.IGNORECASE,
)
_RX_TAG = re.compile(rb"<[^>]+>")


def extract_links(html: bytes | str | None) -> List[Tuple[str, str]]:
    """Return [(href, anchor_text), ...] in document order.

    href is the raw attribute value (resolution + normalization happen
    downstream, job.go:821-832); anchor text is the tag-stripped inner text
    with strings.TrimSpace semantics (job.go:818).
    """
    if html is None:
        return []
    if isinstance(html, str):
        html = html.encode("utf-8")
    out = []
    for m in _RX_ANCHOR.finditer(html):
        href = m.group(1).decode("utf-8", "replace")
        inner = _RX_TAG.sub(b"", m.group(2))
        anchor = inner.decode("utf-8", "replace").strip()
        out.append((href, anchor))
    return out


def xpath_first_value(html: bytes | str | None, path: str) -> str:
    """First-node string value for the ``//tag`` xpath subset.

    The reference evaluates each CallbackXpathMatch/CallbackXpathRegexp key
    with antchfx/xpath and compares the first node's string value for
    EQUALITY — even for the \"Regexp\" variant (job.go:233-269, the
    documented quirk). With no xpath library in this sandbox, the fixture
    contract (FIXTURES.md HTML subset) allows an exact regex evaluator for
    ``//tag`` paths: first occurrence of the tag, inner text, tags
    stripped. Unknown node → empty string (antchfx: empty node value)."""
    if html is None or not path.startswith("//"):
        return ""
    tag = path[2:].strip().lower()
    if not tag.isalnum():
        return ""
    if isinstance(html, str):
        html = html.encode("utf-8")
    m = re.search(
        rb"<" + tag.encode() + rb"[^>]*>(.*?)</" + tag.encode() + rb">",
        html, re.DOTALL | re.IGNORECASE,
    )
    if m is None:
        return ""
    return _RX_TAG.sub(b"", m.group(1)).decode("utf-8", "replace")


def xpath_all_equal(html, pairs) -> bool:
    """ALL (path, value) pairs must match by string equality (job.go:233-269)."""
    return all(xpath_first_value(html, p) == v for p, v in pairs)


def xpath_match_udf(pairs):
    """pandas UDF html → bool: every xpath pair equals its value."""
    from pyspark.sql.functions import pandas_udf

    pairs = tuple(pairs)

    @pandas_udf("boolean")
    def _match(html: pd.Series) -> pd.Series:
        return html.map(lambda b: xpath_all_equal(b, pairs))

    return _match


LINKS_SCHEMA = "array<struct<href:string,anchor:string>>"


def extract_links_udf():
    """pandas UDF: html binary → array<struct<href,anchor>>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LINKS_SCHEMA)
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_links(b))

    return _extract
