"""RSS/Atom feed ingestion: feed discovery from HTML ``<link>`` tags +
RSS 2.0 / Atom 1.0 parsing into frontier-ready URL rows.

The reference crawler discovers URLs only by following ``<a href>`` links
(`/root/reference/job.go` link extraction); syndication feeds are the
other standard discovery channel a production frontier consumes — they
carry NEW urls hours before any page links to them, which is exactly the
freshness signal the recrawl scheduler (operators/recrawl.py) wants.
This module adds that surface as a first-class Spark source, mirroring
sources/sitemap.py's design:

- ``feeds_from_html``: scan an HTML payload for
  ``<link rel="alternate" type="application/rss+xml|atom+xml" href=…>``
  autodiscovery tags (the RSS/Atom autodiscovery convention every
  browser/reader implements). Bounded regex over link tags — no DOM
  build needed for a fixed-shape head tag.
- ``parse_feed``: tolerant scanner over one XML payload → ('rss'|
  'atom'|'invalid', entries). Same parsing discipline as parse_sitemap:
  bounded regex block scan, NOT a DTD-expanding XML parser (entity bombs
  cannot amplify), gzip accepted with a bounded inflate, payloads over
  ``MAX_FEED_BYTES`` rejected up front.
- ``feed_to_entries``: the Spark surface — one ``mapInPandas`` pass over
  (url, content) feed files, emitting one row per entry with the link
  resolved against the feed URL and canonicalized through the engine's
  own normalizer, plus ``pub_epoch`` (RFC 822 / RFC 3339 timestamps
  parsed to integer epoch seconds — integer so oracle value-hashes are
  exact) and the same-host flag frontier policy gates on.

Scale shape: parsing is per-file map-only (no shuffle); output is
frontier-shaped (url, pub_epoch, …) and feeds the existing seen-set
anti-join + recrawl scheduler. One feed file = one row; a pathological
payload is bounded by MAX_FEED_BYTES before any inflate/scan work.
"""
from __future__ import annotations

import re
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from ideacrawler_spark.functions.urlnorm import (
    canonicalize,
    host_of,
    resolve_and_canonicalize,
)

MAX_FEED_BYTES = 16 * 1024 * 1024  # generous; real feeds are ≤ a few MB

_RSS_ROOT = re.compile(rb"<(?:\w+:)?rss[\s>]", re.I)
_ATOM_ROOT = re.compile(rb"<(?:\w+:)?feed[\s>]", re.I)
_ITEM_BLOCK = re.compile(rb"<(?:\w+:)?item[\s>].*?</(?:\w+:)?item\s*>",
                         re.S | re.I)
_ENTRY_BLOCK = re.compile(rb"<(?:\w+:)?entry[\s>].*?</(?:\w+:)?entry\s*>",
                          re.S | re.I)
# Atom <link href="…" rel="…"/> — self-closing, attributes in any order
_ATOM_LINK = re.compile(rb"<(?:\w+:)?link\b([^>]*?)/?>", re.I)
_ATTR = re.compile(rb"""(\w+)\s*=\s*(?:"([^"]*)"|'([^']*)')""")

# HTML feed autodiscovery: <link … rel="alternate" … type="application/
# rss+xml|atom+xml" … href="…">. Attribute order varies in the wild, so
# capture the whole tag and pick attributes out of it.
_HTML_LINK_TAG = re.compile(rb"<link\b[^>]*>", re.I)


def _unescape(s: str) -> str:
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&#39;", "'"), ("&amp;", "&")):
        s = s.replace(ent, ch)
    if s.startswith("<![CDATA[") and s.endswith("]]>"):
        s = s[9:-3]
    return s.strip()


def _tag_text(block: bytes, tag: str) -> Optional[str]:
    m = re.search(
        rb"<(?:\w+:)?" + tag.encode() + rb"(?:\s[^>]*)?>\s*(.*?)\s*</(?:\w+:)?"
        + tag.encode() + rb"\s*>",
        block,
        re.S | re.I,
    )
    if m is None:
        return None
    return _unescape(m.group(1).decode("utf-8", errors="replace"))


def _attrs(tag_bytes: bytes) -> dict:
    out = {}
    for m in _ATTR.finditer(tag_bytes):
        k = m.group(1).decode("ascii", errors="replace").lower()
        v = (m.group(2) if m.group(2) is not None else m.group(3) or b"")
        out[k] = _unescape(v.decode("utf-8", errors="replace"))
    return out


def _parse_ts(s: Optional[str]) -> Optional[int]:
    """RFC 822 (RSS pubDate) or RFC 3339 (Atom updated/published) →
    integer epoch seconds; None if absent/unparseable. Naive timestamps
    are taken as UTC (the only deterministic reading)."""
    if not s:
        return None
    s = s.strip()
    dt = None
    try:
        dt = parsedate_to_datetime(s)
    except (TypeError, ValueError):
        pass
    if dt is None:
        try:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError:
            return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _atom_entry_link(block: bytes) -> Optional[str]:
    """Atom entry link selection per RFC 4287 §4.2.7.2: prefer
    rel="alternate" (rel absent defaults to alternate); first match in
    document order wins."""
    for m in _ATOM_LINK.finditer(block):
        a = _attrs(m.group(1))
        href = a.get("href")
        if not href:
            continue
        if a.get("rel", "alternate").lower() == "alternate":
            return href
        # self/enclosure/other rels never become the entry url
    return None


def parse_feed(xml: bytes) -> Tuple[str, List[dict]]:
    """(kind, entries) for one feed payload.

    kind = 'rss' | 'atom' | 'invalid'. Each entry dict carries
    link/title/guid/pub (pub = raw timestamp string). Oversized or
    unrecognizable payloads return ('invalid', [])."""
    if not xml or len(xml) > MAX_FEED_BYTES:
        return "invalid", []
    if xml[:2] == b"\x1f\x8b":
        import zlib

        try:
            d = zlib.decompressobj(wbits=31)
            xml = d.decompress(xml, MAX_FEED_BYTES + 1)
        except zlib.error:
            return "invalid", []
        if len(xml) > MAX_FEED_BYTES or d.unconsumed_tail:
            return "invalid", []
    if _RSS_ROOT.search(xml):
        out = []
        for m in _ITEM_BLOCK.finditer(xml):
            b = m.group(0)
            link = _tag_text(b, "link")
            guid = _tag_text(b, "guid")
            if not link and guid and guid.startswith(("http://", "https://")):
                link = guid  # permalink-style guid doubles as the link
            if not link:
                continue
            out.append({
                "link": link,
                "title": _tag_text(b, "title"),
                "guid": guid,
                "pub": _tag_text(b, "pubDate"),
            })
        return "rss", out
    if _ATOM_ROOT.search(xml):
        out = []
        for m in _ENTRY_BLOCK.finditer(xml):
            b = m.group(0)
            link = _atom_entry_link(b)
            if not link:
                continue
            out.append({
                "link": link,
                "title": _tag_text(b, "title"),
                "guid": _tag_text(b, "id"),
                "pub": _tag_text(b, "published") or _tag_text(b, "updated"),
            })
        return "atom", out
    return "invalid", []


def feeds_from_html(html: bytes, base_url: str) -> List[dict]:
    """Feed autodiscovery over one HTML payload: every
    ``<link rel=alternate type=application/(rss|atom)+xml href=…>``,
    href resolved against the page URL and canonicalized. Returns
    [{'feed_url', 'feed_type'}] in document order, deduped on feed_url."""
    if not html or len(html) > MAX_FEED_BYTES:
        return []
    seen = set()
    out = []
    for m in _HTML_LINK_TAG.finditer(html):
        a = _attrs(m.group(0))
        rels = (a.get("rel") or "").lower().split()
        typ = (a.get("type") or "").lower().strip()
        href = a.get("href")
        if "alternate" not in rels or not href:
            continue
        if typ not in ("application/rss+xml", "application/atom+xml"):
            continue
        url = resolve_and_canonicalize(base_url, href)
        if not url or url in seen:
            continue
        seen.add(url)
        out.append({
            "feed_url": url,
            "feed_type": "rss" if typ.endswith("rss+xml") else "atom",
        })
    return out


# Content types that mark a fetched page as a FEED document for the
# crawl engine's follow_feeds mode (plans/round.py). Feed-ness is decided
# by content type — not content sniffing — so the engine and the
# reference simulator agree deterministically on mislabeled payloads.
FEED_MIMETYPES = (
    "application/rss+xml",
    "application/atom+xml",
    "application/xml",
    "text/xml",
)


def feed_entry_links(xml: bytes) -> List[tuple]:
    """[(raw link, title)] in document order for a feed payload — the
    crawl engine's link-extraction view of a feed page (resolution and
    normalization happen downstream exactly like <a href> links)."""
    _, entries = parse_feed(xml)
    return [(e["link"], e.get("title") or "") for e in entries]


def autodiscovery_hrefs(html: bytes) -> List[str]:
    """RAW hrefs of feed autodiscovery <link> tags in document order (no
    dedup, no resolution — the crawl engine treats them exactly like
    <a href> values; the standalone :func:`feeds_from_html` keeps its
    resolved+deduped surface)."""
    if not html or len(html) > MAX_FEED_BYTES:
        return []
    out = []
    for m in _HTML_LINK_TAG.finditer(html):
        a = _attrs(m.group(0))
        rels = (a.get("rel") or "").lower().split()
        typ = (a.get("type") or "").lower().strip()
        href = a.get("href")
        if "alternate" not in rels or not href:
            continue
        if typ not in ("application/rss+xml", "application/atom+xml"):
            continue
        out.append(href)
    return out


FEED_ENTRIES_SCHEMA = (
    "feed_url string, kind string, link string, url string, title string, "
    "guid string, pub_epoch long, same_host boolean"
)


def feed_to_entries(files: DataFrame, content_col: str = "content",
                    url_col: str = "url") -> DataFrame:
    """One row per feed entry across all files (map-only, no shuffle).

    ``url`` is the entry link resolved against the feed's own URL and
    canonicalized by the engine normalizer (null if unresolvable);
    ``pub_epoch`` is the published timestamp as integer epoch seconds;
    ``same_host`` compares against the feed's host (frontier policy
    uses it the same way as sitemap cross-host validity)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for furl, blob in zip(pdf[url_col], pdf[content_col]):
                kind, entries = parse_feed(bytes(blob) if blob is not None
                                           else b"")
                f_host = host_of(furl or "")
                for e in entries:
                    url = resolve_and_canonicalize(furl or "", e["link"])
                    rows.append((
                        furl, kind, e["link"], url, e.get("title"),
                        e.get("guid"), _parse_ts(e.get("pub")),
                        bool(url) and host_of(url) == f_host,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["feed_url", "kind", "link", "url", "title",
                         "guid", "pub_epoch", "same_host"],
            )

    return files.mapInPandas(batches, schema=FEED_ENTRIES_SCHEMA)


FEED_DISCOVERY_SCHEMA = "page_url string, feed_url string, feed_type string"


def discover_feeds(pages: DataFrame, content_col: str = "content",
                   url_col: str = "url") -> DataFrame:
    """Feed autodiscovery over crawled pages (map-only): one row per
    (page, feed) in document order."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for purl, blob in zip(pdf[url_col], pdf[content_col]):
                body = bytes(blob) if blob is not None else b""
                for f in feeds_from_html(body, purl or ""):
                    rows.append((purl, f["feed_url"], f["feed_type"]))
            yield pd.DataFrame(
                rows, columns=["page_url", "feed_url", "feed_type"])

    return pages.mapInPandas(batches, schema=FEED_DISCOVERY_SCHEMA)


def build_rss(feed_title: str, items: List[dict]) -> bytes:
    """Serialize items to RSS 2.0 XML (test/fixture helper — inverse of
    parse_feed, like sitemap.build_sitemap)."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel>',
             f"<title>{esc(feed_title)}</title>"]
    for it in items:
        parts.append("<item>")
        for k, tag in (("title", "title"), ("link", "link"),
                       ("guid", "guid"), ("pub", "pubDate")):
            if it.get(k) is not None:
                parts.append(f"<{tag}>{esc(it[k])}</{tag}>")
        parts.append("</item>")
    parts.append("</channel></rss>")
    return "\n".join(parts).encode()


def build_atom(feed_title: str, entries: List[dict]) -> bytes:
    """Serialize entries to Atom 1.0 XML (test/fixture helper)."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">',
             f"<title>{esc(feed_title)}</title>"]
    for e in entries:
        parts.append("<entry>")
        if e.get("title") is not None:
            parts.append(f"<title>{esc(e['title'])}</title>")
        if e.get("link") is not None:
            rel = e.get("rel")
            relattr = f' rel="{esc(rel)}"' if rel else ""
            parts.append(f'<link{relattr} href="{esc(e["link"])}"/>')
        if e.get("guid") is not None:
            parts.append(f"<id>{esc(e['guid'])}</id>")
        if e.get("pub") is not None:
            parts.append(f"<published>{esc(e['pub'])}</published>")
        parts.append("</entry>")
    parts.append("</feed>")
    return "\n".join(parts).encode()
