"""Sitemap ingestion: robots.txt ``Sitemap:`` discovery + sitemap.xml /
sitemap-index parsing into frontier-ready URL rows.

The reference crawler discovers URLs only by following links
(`/root/reference/job.go` link extraction); its vendored robots parser
tokenizes but discards ``Sitemap:`` lines
(`/root/reference/vendor/github.com/temoto/robotstxt-go/parser.go`).
A Common-Crawl-scale frontier gets a large fraction of its seed URLs from
sitemaps, so this module adds the standard protocol surface
(https://www.sitemaps.org/protocol.html) as a first-class Spark source:

- ``sitemaps_from_robots``: scan robots.txt text for ``Sitemap:`` lines
  (case-insensitive key, value to end-of-line — the de-facto rule every
  major crawler applies; the directive is group-independent).
- ``parse_sitemap``: tolerant scanner over one XML payload, returning
  either index entries (child sitemap locs) or url entries with the four
  optional protocol fields. Implemented as a bounded regex scan — NOT a
  DTD-expanding XML parser — so crafted entity payloads (billion-laughs)
  cannot amplify; input over ``MAX_SITEMAP_BYTES`` (protocol cap 50 MB)
  is rejected up front.
- ``sitemap_to_entries``: the Spark surface — one ``mapInPandas`` pass
  over (url, content) sitemap files, emitting one row per entry with the
  protocol's cross-host guard applied (a <loc> is only valid if its host
  matches the sitemap's own host) and the loc canonicalized through the
  engine's own URL normalizer so the frontier join keys line up.

Scale shape: parsing is per-file map-only (no shuffle); the output is
frontier-shaped (url, lastmod, changefreq, priority) and feeds the
existing seen-set anti-join. 50k-URL sitemap files at Common-Crawl scale
stay one-file-per-row; a pathological single file is bounded by the
protocol's own 50 MB cap enforced here.
"""
from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from ideacrawler_spark.functions.urlnorm import canonicalize, host_of

MAX_SITEMAP_BYTES = 50 * 1024 * 1024  # sitemaps.org protocol limit

# key and value are trimmed of horizontal whitespace (Google's documented
# parse rule trims around the colon); \s is avoided so a match never
# crosses line boundaries
_SITEMAP_LINE = re.compile(r"^[ \t]*sitemap[ \t]*:[ \t]*(\S+)[ \t]*\r?$",
                           re.I | re.M)

# Block scanners: tolerant of attribute noise and namespace prefixes
# (<sm:url>, <urlset xmlns=...>). DOTALL block capture with lazy body.
_URL_BLOCK = re.compile(rb"<(?:\w+:)?url[\s>].*?</(?:\w+:)?url\s*>", re.S | re.I)
_SM_BLOCK = re.compile(
    rb"<(?:\w+:)?sitemap[\s>].*?</(?:\w+:)?sitemap\s*>", re.S | re.I
)
_INDEX_ROOT = re.compile(rb"<(?:\w+:)?sitemapindex[\s>]", re.I)


def _tag_text(block: bytes, tag: str) -> Optional[str]:
    m = re.search(
        rb"<(?:\w+:)?" + tag.encode() + rb"\s*>\s*(.*?)\s*</(?:\w+:)?"
        + tag.encode() + rb"\s*>",
        block,
        re.S | re.I,
    )
    if m is None:
        return None
    val = m.group(1)
    # protocol requires entity-escaped values; undo the five XML entities
    s = val.decode("utf-8", errors="replace")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        s = s.replace(ent, ch)
    # CDATA tolerance (seen in the wild)
    if s.startswith("<![CDATA[") and s.endswith("]]>"):
        s = s[9:-3]
    return s.strip()


def sitemaps_from_robots(robots_txt: str) -> List[str]:
    """All ``Sitemap:`` directive values in a robots.txt body, in file
    order. Group-independent per the de-facto standard."""
    if not robots_txt:
        return []
    return _SITEMAP_LINE.findall(robots_txt)


def parse_sitemap(xml: bytes) -> Tuple[str, List[dict]]:
    """(kind, entries) for one sitemap payload.

    kind = 'index' → entries are {'loc': child-sitemap-url, 'lastmod'};
    kind = 'urlset' → entries carry loc/lastmod/changefreq/priority.
    Oversized or unrecognizable payloads return ('invalid', []).
    """
    if not xml or len(xml) > MAX_SITEMAP_BYTES:
        return "invalid", []
    if xml[:2] == b"\x1f\x8b":
        # gzipped sitemap (sitemaps.org allows .xml.gz; CC serves them
        # routinely). Bounded inflate — same zlib-bomb discipline as the
        # PNG decoder: never materialize more than MAX_SITEMAP_BYTES+1.
        import zlib

        try:
            d = zlib.decompressobj(wbits=31)
            xml = d.decompress(xml, MAX_SITEMAP_BYTES + 1)
        except zlib.error:
            return "invalid", []
        if len(xml) > MAX_SITEMAP_BYTES or d.unconsumed_tail:
            return "invalid", []
    if _INDEX_ROOT.search(xml):
        out = []
        for m in _SM_BLOCK.finditer(xml):
            loc = _tag_text(m.group(0), "loc")
            if loc:
                out.append({"loc": loc, "lastmod": _tag_text(m.group(0), "lastmod")})
        return "index", out
    entries = []
    for m in _URL_BLOCK.finditer(xml):
        block = m.group(0)
        loc = _tag_text(block, "loc")
        if not loc:
            continue
        prio_s = _tag_text(block, "priority")
        try:
            prio = float(prio_s) if prio_s is not None else None
        except ValueError:
            prio = None
        entries.append(
            {
                "loc": loc,
                "lastmod": _tag_text(block, "lastmod"),
                "changefreq": _tag_text(block, "changefreq"),
                "priority": prio,
            }
        )
    if entries or re.search(rb"<(?:\w+:)?urlset[\s>]", xml, re.I):
        return "urlset", entries
    return "invalid", []


SITEMAP_ENTRIES_SCHEMA = (
    "sitemap_url string, kind string, loc string, url string, "
    "lastmod string, changefreq string, priority double, same_host boolean"
)


def sitemap_to_entries(files: DataFrame, content_col: str = "content",
                       url_col: str = "url") -> DataFrame:
    """One row per sitemap entry across all files (map-only, no shuffle).

    ``url`` is the loc canonicalized by the engine's normalizer (null if
    the loc is unparseable); ``same_host`` applies the protocol's
    cross-host validity rule against the sitemap's own host. Index
    entries carry kind='index' with url = canonicalized child sitemap.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for smurl, blob in zip(pdf[url_col], pdf[content_col]):
                kind, entries = parse_sitemap(bytes(blob) if blob is not None
                                              else b"")
                sm_host = host_of(smurl or "")
                for e in entries:
                    canon = canonicalize(e["loc"])
                    rows.append(
                        (
                            smurl,
                            kind,
                            e["loc"],
                            canon,
                            e.get("lastmod"),
                            e.get("changefreq"),
                            e.get("priority"),
                            bool(canon) and host_of(canon) == sm_host,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "kind", "loc", "url", "lastmod",
                    "changefreq", "priority", "same_host",
                ],
            )

    return files.mapInPandas(batches, schema=SITEMAP_ENTRIES_SCHEMA)


def robots_sitemaps_udf():
    """Arrow-vectorized: robots.txt body → array of Sitemap: values."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _sm(body: pd.Series) -> pd.Series:
        return body.map(lambda b: sitemaps_from_robots(b or ""))

    return _sm


def build_sitemap(urls: List[dict], index: bool = False) -> bytes:
    """Serialize entries to protocol XML (test/fixture helper — the
    inverse of parse_sitemap, like warc.build_warc)."""
    root = "sitemapindex" if index else "urlset"
    item = "sitemap" if index else "url"
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{root} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u in urls:
        parts.append(f"<{item}>")
        loc = (u["loc"].replace("&", "&amp;").replace("<", "&lt;")
               .replace(">", "&gt;"))
        parts.append(f"<loc>{loc}</loc>")
        for k in ("lastmod", "changefreq", "priority"):
            if u.get(k) is not None:
                parts.append(f"<{k}>{u[k]}</{k}>")
        parts.append(f"</{item}>")
    parts.append(f"</{root}>")
    return "\n".join(parts).encode()
