"""Reference-anchored golden: TestMultiSiteFilter/depth1Raw
(/root/reference/main_test.go:135-216).

The reference's own e2e test is: a SEEDLESS job, two pushed root pages on
two hosts, depth 1, FollowURLRegexp "com$|author", CallbackURLRegexp
"hub|author", Impolite, MinDelay 1 — and it asserts EXACTLY 9 shipped
pages, all HTTP 200. The real test crawls the live toscrape.com sites;
this fixture mirrors their link structure so the same 9-page contract
holds by construction:

- both pushed roots END in "com" (the follow gate, job.go:188, matches the
  CURRENT page URL — "http://quotes.toscrape.com" passes "com$");
- the quotes-like root links 13 times to 8 DISTINCT /author/ pages
  (duplicate hrefs exercise per-page dedup), plus an ineligible /login
  link and an external https://www.partner.com link (ends in "com" →
  followed; seedless jobs have NO cross-domain gate, job.go:842 requires
  SeedUrl != "");
- the books-like root links to ineligible catalogue pages, ONE /hub/ page
  and the same partner link (deduped across pages by the seen-set);
- shipped = 8 authors + 1 hub = 9; the roots themselves do not match the
  callback and callbackSeedUrl is off; partner is fetched but not shipped.

The numbers asserted here (9 shipped, every status 200, 2 pushed roots,
depth 1) come from the reference repo's published test expectations, not
from the simulator — the simulator must agree with them too.
"""

import datetime as _dt

import pytest

from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.plans.crawl import CrawlEngine
from ideacrawler_spark.refsim import simulate
from ideacrawler_spark.sources.fixtures import PAGES_SCHEMA, ROBOTS_SCHEMA

_TS = _dt.datetime(2020, 1, 1)

AUTHORS = [
    "Albert-Einstein", "J-K-Rowling", "Jane-Austen", "Marilyn-Monroe",
    "Andre-Gide", "Thomas-A-Edison", "Eleanor-Roosevelt", "Steve-Martin",
]
# 13 author links, 8 distinct (Einstein ×3, Rowling ×2, like page 1 of
# quotes.toscrape.com)
AUTHOR_LINK_SEQ = (
    ["Albert-Einstein", "J-K-Rowling", "Albert-Einstein", "Jane-Austen",
     "Albert-Einstein", "J-K-Rowling", "Marilyn-Monroe", "Andre-Gide",
     "Thomas-A-Edison", "Eleanor-Roosevelt", "Steve-Martin",
     "Jane-Austen", "Marilyn-Monroe"]
)


def _page(url, html, text, status=200):
    return dict(url=url, warc_ts=_TS, html=html.encode(), text=text,
                lang="en", status=status, content_type="text/html")


def _build_web():
    q_root = "http://quotes.fixture.com"
    b_root = "http://books.fixture.com"
    partner = "https://www.partner.com"

    q_links = "\n".join(
        f'<a href="/author/{a}">{a.replace("-", " ")}</a>'
        for a in AUTHOR_LINK_SEQ
    )
    q_html = (
        "<html><body>" + q_links +
        '<a href="/login">Login</a>'
        f'<a href="{partner}">Partner</a>'
        "</body></html>"
    )
    b_html = (
        "<html><body>"
        '<a href="catalogue/page-2.html">next</a>'
        '<a href="catalogue/category/books/travel_2/index.html">Travel</a>'
        '<a href="/hub/specials">Specials hub</a>'
        f'<a href="{partner}">Partner</a>'
        "</body></html>"
    )
    pages = [
        _page(q_root, q_html, "quotes root"),
        _page(b_root, b_html, "books root"),
        _page(f"{b_root}/hub/specials", "<html><body>hub</body></html>",
              "specials hub page"),
        _page(partner, "<html><body>partner</body></html>", "partner corp"),
        _page(f"{q_root}/login", "<html><body>login</body></html>", "login"),
    ]
    for a in AUTHORS:
        pages.append(
            _page(f"{q_root}/author/{a}",
                  f'<html><body>bio <a href="/">home</a></body></html>',
                  f"about {a}")
        )
    pushes = [
        dict(round=0, url=q_root, method="GET", meta="", seq=0),
        dict(round=0, url=b_root, method="GET", meta="", seq=1),
    ]
    return pages, pushes


def _spec():
    # gc.NewJobSpec(SeedURL(""), Depth(1), MinDelay(1), Impolite(),
    #               CallbackURLRegexp("hub|author"),
    #               FollowURLRegexp("com$|author"))
    return JobSpec(
        job_id="multisite", seed_url="", depth=1,
        follow_url_regexp="com$|author",
        callback_url_regexp="hub|author",
        impolite=True, min_delay_s=1, round_seconds=30,
    )


def test_multisite_filter_reference_counts(spark):
    """The reference-published contract: exactly 9 shipped, all 200."""
    pages, pushes = _build_web()
    spec = _spec()

    golden = simulate(spec, pages, [], pushes)
    # --- the numbers from main_test.go:155-166 ---------------------------
    assert len(golden.shipped) == 9
    assert all(s["status"] == 200 for s in golden.shipped)
    shipped_urls = {s["url"] for s in golden.shipped}
    assert shipped_urls == (
        {f"http://quotes.fixture.com/author/{a}" for a in AUTHORS}
        | {"http://books.fixture.com/hub/specials"}
    )
    # roots and partner fetched but not shipped; login never fetched
    fetched = {o["url"] for o in golden.order}
    assert "https://www.partner.com" in fetched
    assert "http://quotes.fixture.com/login" not in fetched
    assert len(golden.order) == 12  # 2 roots + 8 authors + hub + partner

    # --- the Spark engine reproduces it bit-for-bit ----------------------
    pages_df = spark.createDataFrame(pages, PAGES_SCHEMA)
    robots_df = spark.createDataFrame([], ROBOTS_SCHEMA)
    got = CrawlEngine(spark, spec, pages_df, robots_df, pushes,
                      shuffle_partitions=8).run()
    shipped = got["shipped"].collect()
    assert len(shipped) == 9
    assert all(r["status"] == 200 for r in shipped)
    assert {r["url"] for r in shipped} == shipped_urls
    order = [(r["fetch_seq"], r["url"]) for r in
             got["order"].orderBy("fetch_seq").collect()]
    want = [(o["fetch_seq"], o["url"]) for o in golden.order]
    assert order == want
    # shipped text is byte-identical per url
    texts = {r["url"]: r["text"] for r in shipped}
    want_texts = {s["url"]: s["text"] for s in golden.shipped}
    assert texts == want_texts
