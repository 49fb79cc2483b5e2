"""RSS/Atom feed source (sources/feeds.py): parser unit vectors,
autodiscovery, adversarial payloads, and the Spark mapInPandas surface.

The reference has no feed surface (URL discovery is <a href> only,
/root/reference/job.go); feeds are the freshness-discovery channel a
Common-Crawl-style frontier adds, so the semantics here are anchored to
the public specs: RSS 2.0 (pubDate RFC 822), Atom RFC 4287 (link
rel=alternate selection, RFC 3339 timestamps), and the autodiscovery
<link rel=alternate type=application/(rss|atom)+xml> convention.
"""

import zlib

from ideacrawler_spark.sources.feeds import (
    MAX_FEED_BYTES,
    build_atom,
    build_rss,
    discover_feeds,
    feed_to_entries,
    feeds_from_html,
    parse_feed,
    _parse_ts,
)


def test_rss_parse_vectors():
    rss = build_rss("Blog", [
        {"title": "A & B", "link": "http://f.example/a", "guid": "g1",
         "pub": "Mon, 02 Feb 2026 03:04:05 GMT"},
        {"title": "NoLink"},
        {"guid": "http://f.example/permalink"},
        {"guid": "not-a-url-guid", "title": "dropped too"},
    ])
    kind, entries = parse_feed(rss)
    assert kind == "rss"
    assert [e["link"] for e in entries] == [
        "http://f.example/a", "http://f.example/permalink"]
    assert entries[0]["title"] == "A & B"          # entity round-trip
    assert entries[0]["pub"] == "Mon, 02 Feb 2026 03:04:05 GMT"


def test_atom_rel_selection():
    atom = build_atom("A", [
        {"title": "E1", "link": "http://a.example/e1"},       # rel absent
        {"title": "Self", "link": "http://a.example/s", "rel": "self"},
        {"title": "Alt", "link": "http://a.example/alt", "rel": "alternate"},
    ])
    kind, entries = parse_feed(atom)
    assert kind == "atom"
    # rel-absent defaults to alternate (RFC 4287 4.2.7.2); rel=self never
    # becomes the entry url
    assert [e["link"] for e in entries] == [
        "http://a.example/e1", "http://a.example/alt"]


def test_timestamps_rfc822_rfc3339():
    assert _parse_ts("Mon, 02 Feb 2026 03:04:05 GMT") == 1770001445
    assert _parse_ts("2026-02-02T03:04:05Z") == 1770001445
    assert _parse_ts("2026-02-02T03:04:05+02:00") == 1770001445 - 7200
    assert _parse_ts("2026-02-02T03:04:05") == 1770001445  # naive → UTC
    assert _parse_ts("bogus") is None and _parse_ts(None) is None


def test_adversarial_payloads():
    assert parse_feed(b"") == ("invalid", [])
    assert parse_feed(b"<html>x</html>") == ("invalid", [])
    assert parse_feed(b"\x00" * 64) == ("invalid", [])
    assert parse_feed(b"x" * (MAX_FEED_BYTES + 1)) == ("invalid", [])
    # truncated mid-item: no crash, items before the cut survive
    rss = build_rss("B", [{"title": "t", "link": "http://h.example/x"},
                          {"title": "u", "link": "http://h.example/y"}])
    kind, entries = parse_feed(rss[: rss.rindex(b"<item>") + 10])
    assert kind == "rss" and len(entries) == 1
    # gzip accepted; zlib bomb rejected by the bounded inflate
    import gzip

    assert parse_feed(gzip.compress(rss))[0] == "rss"
    bomb = gzip.compress(b"<rss>" + b"A" * (MAX_FEED_BYTES * 2))
    assert parse_feed(bomb) == ("invalid", [])
    # a DOCTYPE entity payload is inert (regex scan, no DTD expansion)
    lol = (b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "ha">]>'
           b"<rss><channel><item><link>http://h.example/&a;</link>"
           b"</item></channel></rss>")
    kind, entries = parse_feed(lol)
    assert kind == "rss" and entries[0]["link"] == "http://h.example/&a;"


def test_autodiscovery_dedup_and_filtering():
    html = (b'<head>'
            b'<link rel="alternate" type="application/rss+xml" href="/f.xml">'
            b'<LINK REL="ALTERNATE" TYPE="application/atom+xml" href="a.xml">'
            b'<link rel="stylesheet" href="/s.css">'
            b'<link rel="alternate" type="text/html" href="/alt">'
            b'<link rel="alternate" type="application/rss+xml" href="/f.xml">'
            b'</head>')
    out = feeds_from_html(html, "http://p.example/dir/page.html")
    assert out == [
        {"feed_url": "http://p.example/f.xml", "feed_type": "rss"},
        {"feed_url": "http://p.example/dir/a.xml", "feed_type": "atom"},
    ]
    assert feeds_from_html(b"", "http://p.example/") == []


def test_spark_surface_resolution_and_epoch(spark):
    files = spark.createDataFrame(
        [("http://f.example/blog/feed.xml",
          bytearray(build_rss("B", [
              {"title": "R", "link": "rel.html",
               "pub": "Mon, 02 Feb 2026 03:04:05 GMT"},
              {"title": "X", "link": "http://other.example/x"},
          ]))),
         ("http://bad.example/f", bytearray(b"junk"))],
        "url string, content binary")
    rows = {r["link"]: r for r in feed_to_entries(files).collect()}
    assert rows["rel.html"]["url"] == "http://f.example/blog/rel.html"
    assert rows["rel.html"]["pub_epoch"] == 1770001445
    assert rows["rel.html"]["same_host"] is True
    assert rows["http://other.example/x"]["same_host"] is False
    assert len(rows) == 2  # junk file contributes nothing

    pages = spark.createDataFrame(
        [("http://p.example/i.html",
          bytearray(b'<link rel="alternate" type="application/atom+xml" '
                    b'href="/fa.xml">'))],
        "url string, content binary")
    d = discover_feeds(pages).collect()
    assert [(r["feed_url"], r["feed_type"]) for r in d] == [
        ("http://p.example/fa.xml", "atom")]


def _feed_web():
    from ideacrawler_spark.sources.fixtures import synth_feed_web

    return synth_feed_web()


def test_follow_feeds_crawl_matches_simulator(spark):
    """Golden: the engine's feed-following crawl (regex-scan parser,
    distributed plan) must match the simulator's independent
    ElementTree/HTMLParser implementation bit-for-bit — order, seen-set,
    shipped rows, outlinks."""
    import pandas as pd
    import test_crawl_e2e as e2e

    from ideacrawler_spark.config import JobSpec
    from ideacrawler_spark.plans.crawl import CrawlEngine
    from ideacrawler_spark.refsim import simulate
    from ideacrawler_spark.sources.fixtures import PAGES_SCHEMA, ROBOTS_SCHEMA

    pages = _feed_web()
    spec = JobSpec(job_id="feedjob", seed_url="http://fs.example/",
                   follow_other_domains=True, impolite=True,
                   follow_feeds=True, min_delay_s=1, round_seconds=10,
                   max_concurrent=1 << 20)
    golden = simulate(spec, pages, [])
    pages_df = spark.createDataFrame(pd.DataFrame(pages), PAGES_SCHEMA)
    robots_df = spark.createDataFrame([], ROBOTS_SCHEMA)
    got = CrawlEngine(spark, spec, pages_df, robots_df,
                      shuffle_partitions=8).run()
    e2e._assert_match(golden, got)

    fetched = {o["url"] for o in golden.order}
    shipped = {s["url"]: s for s in golden.shipped}
    # both feeds were fetched, the entries crawled, the feeds never shipped
    assert "http://fs.example/feed.xml" in fetched
    assert "http://blog.other/atom.xml" in fetched
    assert "http://fs.example/posts/1" in shipped
    assert "http://blog.other/p2.html" in shipped
    assert "http://fs.example/feed.xml" not in shipped
    assert "http://blog.other/atom.xml" not in shipped
    # entry title rides as anchor text; rel=self never followed
    assert shipped["http://fs.example/posts/1"]["anchor_text"] == "Post One"
    assert "http://blog.other/self" not in fetched
    # the 404 feed URL was fetched and dropped, never shipped
    assert "http://fs.example/missing.xml" in fetched
    assert "http://fs.example/missing.xml" not in shipped


def test_follow_feeds_off_feeds_invisible(spark):
    """Default job: autodiscovery links are not <a href> links — the
    crawl never sees the feeds at all."""
    import pandas as pd

    from ideacrawler_spark.config import JobSpec
    from ideacrawler_spark.refsim import simulate

    pages = _feed_web()
    spec = JobSpec(job_id="nofeeds", seed_url="http://fs.example/",
                   follow_other_domains=True, impolite=True,
                   min_delay_s=1, round_seconds=10)
    golden = simulate(spec, pages, [])
    fetched = {o["url"] for o in golden.order}
    assert fetched == {"http://fs.example/", "http://fs.example/about.html"}
