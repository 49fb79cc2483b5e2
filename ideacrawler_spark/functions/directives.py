"""Per-page indexing directives: <meta name=robots>, X-Robots-Tag,
<link rel=canonical>.

The reference enforces only robots.txt (fetch-time allow/deny,
`/root/reference/vendor/github.com/shsms/fetchbot/fetch.go`); page-level
directives are the OTHER half of the robots contract every production
corpus pipeline must honor: ``noindex`` pages may be fetched but must
not be shipped into the corpus, ``nofollow`` pages contribute no
outlinks to the frontier, and ``rel=canonical`` declares the dedup
representative the page itself elects.

Directive semantics (REP, RFC 9309 companion / Google's documented
rules):
- meta name may target a specific bot ("robots" applies to all); name
  match is case-insensitive; content is a comma-separated token list.
- ``none`` ≡ ``noindex, nofollow``; tokens are case-insensitive and
  whitespace-tolerant.
- the HTTP ``X-Robots-Tag`` header carries the same token grammar and
  ORs with the meta tag (most-restrictive wins).
- first <link rel=canonical href=...> in document order wins; rel
  matching is case-insensitive on a whitespace-separated token list.

Spark surface: ``page_directives_udf`` (Arrow-vectorized struct output)
and ``directives_table`` — map-only, no shuffle; downstream gates are
plain column filters so Catalyst pushes them into the same stage.
"""
from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_TOKEN_SPLIT = re.compile(r"[,\s]+")


def _parse_tokens(content: str) -> Tuple[bool, bool]:
    """(noindex, nofollow) from a robots token list."""
    noindex = nofollow = False
    for tok in _TOKEN_SPLIT.split((content or "").strip().lower()):
        if tok == "noindex":
            noindex = True
        elif tok == "nofollow":
            nofollow = True
        elif tok == "none":
            noindex = nofollow = True
    return noindex, nofollow


class _DirectiveScanner(HTMLParser):
    """Head-order scan for meta robots + first rel=canonical."""

    def __init__(self, bot: str = "robots"):
        super().__init__(convert_charrefs=True)
        self.bot = bot.lower()
        self.noindex = False
        self.nofollow = False
        self.canonical: Optional[str] = None

    def handle_starttag(self, tag, attrs):
        d = {k.lower(): (v or "") for k, v in attrs}
        if tag == "meta":
            name = d.get("name", "").strip().lower()
            if name in ("robots", self.bot):
                ni, nf = _parse_tokens(d.get("content", ""))
                self.noindex |= ni
                self.nofollow |= nf
        elif tag == "link" and self.canonical is None:
            rels = d.get("rel", "").lower().split()
            href = d.get("href", "").strip()
            if "canonical" in rels and href:
                self.canonical = href

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)


def page_directives(html: bytes | str | None,
                    x_robots_tag: Optional[str] = None,
                    bot: str = "robots") -> Tuple[bool, bool, Optional[str]]:
    """(noindex, nofollow, canonical) for one page; the header ORs in."""
    p = _DirectiveScanner(bot=bot)
    if html is not None:
        if isinstance(html, bytes):
            html = html.decode("utf-8", "replace")
        try:
            p.feed(html)
            p.close()
        except Exception:  # noqa: BLE001 — parser never takes down a batch
            pass
    hni, hnf = _parse_tokens(x_robots_tag or "")
    return p.noindex or hni, p.nofollow or hnf, p.canonical


_DIRECTIVES_TYPE = (
    "noindex boolean, nofollow boolean, canonical string"
)


def page_directives_udf(bot: str = "robots"):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_DIRECTIVES_TYPE)
    def _dirs(html: pd.Series, xrt: pd.Series) -> pd.DataFrame:
        rows = [page_directives(h, x, bot=bot) for h, x in zip(html, xrt)]
        return pd.DataFrame(rows, columns=["noindex", "nofollow", "canonical"])

    return _dirs


def directives_table(pages: DataFrame, html_col: str = "html",
                     url_col: str = "url",
                     xrt_col: Optional[str] = None,
                     bot: str = "robots") -> DataFrame:
    """pages + (noindex, nofollow, canonical_url) — canonical resolved
    against the page URL and canonicalized by the engine normalizer so it
    joins the seen-set keyspace. Map-only."""
    from ideacrawler_spark.functions.urlnorm import resolve_and_canonicalize

    xrt = F.col(xrt_col) if xrt_col else F.lit(None).cast("string")
    with_d = pages.withColumn(
        "_d", page_directives_udf(bot=bot)(F.col(html_col).cast("binary"), xrt)
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _canon(url: pd.Series, href: pd.Series) -> pd.Series:
        return pd.Series(
            [
                resolve_and_canonicalize(u, h) if h else None
                for u, h in zip(url, href)
            ],
            dtype=object,
        )

    return with_d.select(
        *pages.columns,
        F.col("_d.noindex").alias("noindex"),
        F.col("_d.nofollow").alias("nofollow"),
        _canon(F.col(url_col), F.col("_d.canonical")).alias("canonical_url"),
    )
