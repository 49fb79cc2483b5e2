"""Sitemap source: robots.txt discovery + urlset/index parsing.

Reference parity note: the reference crawler has NO sitemap surface —
its vendored robots parser tokenizes and discards ``Sitemap:`` lines
(`/root/reference/vendor/github.com/temoto/robotstxt-go/parser.go`) —
so these vectors pin the sitemaps.org protocol semantics directly.
"""
import pytest

from ideacrawler_spark.sources.sitemap import (
    MAX_SITEMAP_BYTES,
    build_sitemap,
    parse_sitemap,
    sitemap_to_entries,
    sitemaps_from_robots,
)


def test_robots_sitemap_lines():
    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.example/s.xml\n"
        "SITEMAP:http://a.example/t.xml\n"
        "  sitemap :  http://a.example/u.xml\n"   # trimmed around ':'
        "NotSitemap: http://a.example/v.xml\n"
    )
    assert sitemaps_from_robots(body) == [
        "http://a.example/s.xml",
        "http://a.example/t.xml",
        "http://a.example/u.xml",
    ]
    assert sitemaps_from_robots("") == []
    assert sitemaps_from_robots(None) == []


def test_parse_urlset_fields_and_entities():
    xml = build_sitemap([
        {"loc": "http://h.example/a?x=1&y=2", "lastmod": "2026-01-01",
         "changefreq": "daily", "priority": "0.7"},
        {"loc": "http://h.example/b"},
    ])
    kind, entries = parse_sitemap(xml)
    assert kind == "urlset"
    assert entries[0] == {
        "loc": "http://h.example/a?x=1&y=2", "lastmod": "2026-01-01",
        "changefreq": "daily", "priority": 0.7,
    }
    assert entries[1]["loc"] == "http://h.example/b"
    assert entries[1]["priority"] is None


def test_parse_index_and_namespaced_tags():
    xml = build_sitemap(
        [{"loc": "http://h.example/s1.xml", "lastmod": "2026-02-02"}],
        index=True,
    )
    kind, entries = parse_sitemap(xml)
    assert kind == "index"
    assert entries == [{"loc": "http://h.example/s1.xml",
                        "lastmod": "2026-02-02"}]
    ns = (b'<sm:sitemapindex xmlns:sm="x"><sm:sitemap>'
          b"<sm:loc>http://h.example/n.xml</sm:loc>"
          b"</sm:sitemap></sm:sitemapindex>")
    kind, entries = parse_sitemap(ns)
    assert kind == "index"
    assert entries[0]["loc"] == "http://h.example/n.xml"


def test_parse_cdata_bad_priority_and_invalid():
    xml = (b"<urlset><url><loc><![CDATA[http://h.example/c]]></loc>"
           b"<priority>high</priority></url></urlset>")
    kind, entries = parse_sitemap(xml)
    assert kind == "urlset"
    assert entries[0]["loc"] == "http://h.example/c"
    assert entries[0]["priority"] is None
    assert parse_sitemap(b"not xml at all") == ("invalid", [])
    assert parse_sitemap(b"") == ("invalid", [])
    assert parse_sitemap(None) == ("invalid", [])
    # oversize payloads are rejected before any scan (bomb guard)
    assert parse_sitemap(b"x" * (MAX_SITEMAP_BYTES + 1)) == ("invalid", [])
    # empty-but-wellformed urlset is recognized, zero entries
    assert parse_sitemap(b"<urlset></urlset>") == ("urlset", [])


def test_sitemap_to_entries_cross_host_and_canon(spark):
    xml = build_sitemap([
        {"loc": "HTTP://H.example/UP.html"},
        {"loc": "http://other.example/x"},
    ])
    files = spark.createDataFrame(
        [("http://h.example/sitemap.xml", bytearray(xml))],
        "url string, content binary",
    )
    rows = {r["loc"]: r for r in sitemap_to_entries(files).collect()}
    up = rows["HTTP://H.example/UP.html"]
    assert up["url"] == "http://h.example/UP.html"
    assert up["same_host"] is True
    other = rows["http://other.example/x"]
    assert other["same_host"] is False
    assert other["kind"] == "urlset"


def test_parse_sitemap_gzipped_and_bomb_guard():
    import gzip as _gzip

    from ideacrawler_spark.sources.sitemap import (
        MAX_SITEMAP_BYTES,
        build_sitemap,
        parse_sitemap,
    )

    xml = build_sitemap([{"loc": "http://h.example/a", "lastmod": "2024-01-01"}])
    kind, entries = parse_sitemap(_gzip.compress(xml))
    assert kind == "urlset"
    assert [e["loc"] for e in entries] == ["http://h.example/a"]

    # a tiny gzip member inflating past the cap must be rejected, not
    # materialized (zlib-bomb discipline)
    bomb = _gzip.compress(b"<urlset>" + b" " * (MAX_SITEMAP_BYTES + 100))
    assert len(bomb) < MAX_SITEMAP_BYTES          # small on the wire
    assert parse_sitemap(bomb) == ("invalid", [])

    # truncated gzip -> invalid, no raise
    assert parse_sitemap(_gzip.compress(xml)[:10]) == ("invalid", [])
