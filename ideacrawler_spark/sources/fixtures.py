"""Deterministic synthetic web — the simulated crawl target.

The ``pages`` table *is* the web (FIXTURES.md): fetching a URL is a join
against it. The generator (seed-driven, pure Python) produces:

- skewed host sizes (hosta ≫ hostb ≫ hostc) to exercise salting;
- a cyclic link graph with duplicate links (same target repeated within a
  page and across pages), cross-host links, dead links, and >3-depth chains;
- hrefs that NEED normalization (uppercase scheme/host, :80 default port,
  %-escaped unreserved chars, fragments, dot segments, trailing '?'),
  while ``pages.url`` is always the canonical purell-FlagsSafe form;
- per-page deterministic ``text`` (the byte-identity target), ``status``
  (200/301/404/500 mix) and ``content_type`` (text/html + a few pdf);
- a ``robots`` table with prefix rules, a wildcard rule, crawl-delays and
  4xx/5xx robots fetch statuses.

Everything is derived from (seed, scale) — no external data, no entropy.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Dict, List

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "status int, content_type string"
)
ROBOTS_SCHEMA = (
    "host string, user_agent string, rule_path string, allow boolean, "
    "crawl_delay double, fetch_status int, rule_seq int"
)

HOSTS = ["hosta.example", "hostb.example", "hostc.example"]
_LANGS = ["en", "en", "en", "de", "fr"]
_WORDS = (
    "crawl frontier spark shuffle partition host depth queue robots delay "
    "page link anchor seed fetch dedup bloom filter hash url norm"
).split()


def _page_url(host: str, i: int) -> str:
    return f"http://{host}/p/{i}"


def _messy_variant(rng: random.Random, host: str, i: int) -> str:
    """An href that canonicalizes to _page_url(host, i)."""
    kind = rng.randrange(6)
    if kind == 0:
        return f"HTTP://{host.upper()}/p/{i}"          # case norm
    if kind == 1:
        return f"http://{host}:80/p/{i}"               # default port
    if kind == 2:
        return f"http://{host}/p/{i}#sec-{rng.randrange(5)}"  # fragment (safe keeps it! see note)
    if kind == 3:
        enc = "".join("%%%02x" % ord(c) for c in str(i))  # lowercase unnecessary escapes
        return f"http://{host}/p/{enc}"
    if kind == 4:
        return f"http://{host}/x/../p/{i}"             # dot segments (resolution removes)
    return f"http://{host}/p/{i}?"                     # empty query separator


def synth_web(seed: int = 42, scale: int = 1):
    """Return (pages_rows, robots_rows, seeds, pushes) as lists of dicts.

    NOTE on fragments: purell FlagsSafe KEEPS fragments, so a '#frag'
    variant is a *distinct* seen-set entry from the bare URL — exactly as in
    the reference. The generator therefore only emits fragment variants when
    exercising unsafe_normalize fixtures is desired; by default variant kind
    2 is remapped to kind 5 for safe-mode graph closure.
    """
    rng = random.Random(seed)
    sizes = {"hosta.example": 60 * scale, "hostb.example": 20 * scale, "hostc.example": 8 * scale}
    all_urls: List[str] = []
    for h in HOSTS:
        all_urls += [_page_url(h, i) for i in range(sizes[h])]

    pages = []
    base_ts = _dt.datetime(2024, 3, 1, 0, 0, 0)
    for h in HOSTS:
        n = sizes[h]
        for i in range(n):
            url = _page_url(h, i)
            # NB: never use Python's salted hash() here — determinism.
            prng = random.Random((seed << 20) ^ (HOSTS.index(h) * 1000003 + i))
            # --- link targets: forward chain + random intra-host + cross-host
            hrefs: List[tuple] = []
            if i + 1 < n:
                hrefs.append((f"/p/{i+1}", f"next {i+1}"))           # depth chain
            if i > 0 and prng.random() < 0.5:
                hrefs.append((f"../p/{prng.randrange(i)}", "back"))   # cycle via dot segment
            for _ in range(prng.randrange(1, 4)):
                j = prng.randrange(n)
                v = _messy_variant(prng, h, j)
                if "#" in v:
                    v = f"http://{h}/p/{j}?"  # remap fragment variant (see docstring)
                hrefs.append((v, f"go {j}"))
            if prng.random() < 0.4:  # duplicate link within page
                hrefs.append(hrefs[-1])
            if prng.random() < 0.5:  # cross-host
                oh = prng.choice([x for x in HOSTS if x != h])
                hrefs.append((_page_url(oh, prng.randrange(sizes[oh])), f"x {oh}"))
            if prng.random() < 0.25:  # dead link
                hrefs.append((f"/dead/{prng.randrange(1000)}", "dead end"))
            if h == "hostb.example" and prng.random() < 0.5:
                hrefs.append((f"/p/1{prng.randrange(min(9, n-10) + 1) if n > 10 else 0}", "maybe blocked"))
            # --- page text: byte-identity target
            words = " ".join(prng.choice(_WORDS) for _ in range(prng.randrange(8, 20)))
            text = f"text of {url} :: {words}"
            body = ["<html><head><title>", url, "</title></head><body><p>", words, "</p>"]
            # data-i = ordinal — a NUMERIC attribute so callback specs can
            # exercise numeric xpath predicates ([@data-i>2]) on the same
            # fixture; anchors' string values and link extraction are
            # unchanged by the attribute
            for a_i, (href, anchor) in enumerate(hrefs):
                body.append(
                    f'<a class="l" data-i="{a_i}" href="{href}">'
                    f'  {anchor} </a>')
            body.append("</body></html>")
            html = "".join(body).encode("utf-8")
            status = 200
            r = prng.random()
            if r < 0.04:
                status = 404
            elif r < 0.06:
                status = 500
            elif r < 0.08:
                status = 301
            ctype = "text/html; charset=utf-8"
            if prng.random() < 0.03:
                ctype = "application/pdf"
            pages.append(
                dict(
                    url=url,
                    warc_ts=base_ts + _dt.timedelta(seconds=len(pages) * 17),
                    html=html,
                    text=text,
                    lang=prng.choice(_LANGS),
                    status=status,
                    content_type=ctype,
                )
            )

    robots = [
        # hosta: allow all except /tmp* wildcard; no crawl delay
        dict(host="hosta.example", user_agent="*", rule_path="/tmp*", allow=False,
             crawl_delay=0.0, fetch_status=200, rule_seq=0),
        # hostb: block the /p/1 prefix (p/1, p/10..p/19), crawl_delay 2s
        dict(host="hostb.example", user_agent="*", rule_path="/p/1", allow=False,
             crawl_delay=2.0, fetch_status=200, rule_seq=0),
        dict(host="hostb.example", user_agent="*", rule_path="/p/10", allow=True,
             crawl_delay=2.0, fetch_status=200, rule_seq=1),  # longest-match override
        # hostc: robots 404 ⇒ allow everything
        dict(host="hostc.example", user_agent="*", rule_path="/", allow=False,
             crawl_delay=0.0, fetch_status=404, rule_seq=0),
    ]

    seeds = [dict(job_id="job1", url="http://hosta.example/p/0", seq=0)]
    pushes = [
        dict(job_id="job1", round=1, url="http://hostb.example/p/0", method="GET",
             meta="push-b0", seq=0),
        dict(job_id="job1", round=2, url="HTTP://HOSTC.example:80/p/0", method="GET",
             meta="push-c0", seq=1),  # NOT normalized on purpose (job.go:696)
    ]
    return pages, robots, seeds, pushes


def synth_feed_web():
    """Mini-web exercising follow_feeds (plans/round.py): the seed HTML
    autodiscovers an RSS feed (same host), an Atom feed (other host) and
    a 404ing feed URL; entries fan out to HTML pages. Deterministic —
    used by both the feed-crawl golden test and the crawl_feeds oracle."""
    from ideacrawler_spark.sources.feeds import build_atom, build_rss

    def page(url, html, text="", status=200, ctype="text/html"):
        # key order matches PAGES_SCHEMA (createDataFrame is positional)
        return dict(url=url, warc_ts=None, html=html, text=text, lang="en",
                    status=status, content_type=ctype)

    rss = build_rss("FS Blog", [
        {"title": "Post One", "link": "/posts/1",
         "pub": "Mon, 02 Feb 2026 03:04:05 GMT"},
        {"title": "Other & Co", "link": "http://blog.other/x"},
        {"guid": "http://fs.example/posts/2"},
    ])
    atom = build_atom("Other Feed", [
        {"title": "P1", "link": "http://blog.other/p1", "guid": "i1"},
        {"title": "Self", "link": "http://blog.other/self", "rel": "self"},
        {"title": "P2", "link": "p2.html"},
    ])
    return [
        page("http://fs.example/", (
            b'<html><head>'
            b'<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
            b'<link rel="alternate" type="application/atom+xml" '
            b'href="http://blog.other/atom.xml">'
            b'<link rel="alternate" type="application/rss+xml" href="/missing.xml">'
            b'</head><body><a href="/about.html">About</a></body></html>'),
            text="home"),
        page("http://fs.example/about.html",
             b'<a href="/">home</a>', text="about page"),
        page("http://fs.example/feed.xml", rss,
             ctype="application/rss+xml"),
        page("http://blog.other/atom.xml", atom,
             ctype="application/atom+xml"),
        page("http://fs.example/posts/1", b"<p>one</p>", text="post one"),
        page("http://fs.example/posts/2", b"<p>two</p>", text="post two"),
        page("http://blog.other/x", b"<p>x</p>", text="other x"),
        page("http://blog.other/p1", b"<p>p1</p>", text="other p1"),
        page("http://blog.other/p2.html", b"<p>p2</p>", text="other p2"),
    ]
