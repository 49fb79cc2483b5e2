"""Anchor-text corpus construction.

The anchor texts pointing AT a page are a classic training/retrieval
signal (anchor-text corpora back query-document training pairs and
page-title augmentation). The reference extracts (href, anchor-text)
pairs per page (job.go:811-838, the tokenizer surface mirrored by
``functions/extract.py:extract_links``); this op lifts that per-page
extraction to the corpus level: parse every page, resolve every href
against its page URL through the SAME resolve+canonicalize path the
crawl enqueue uses, and aggregate identical (target, anchor-text)
pairs with exact counts.

Scale shape: the parse is the engine's Arrow-batched pandas UDF (one
Python boundary, batch-wise), the explode is map-side, the resolve is
the production ``resolve_canon_udf`` batch pass, and the only shuffle
is ONE partial-aggregated groupBy keyed on (target, anchor text). A
mega-target (everyone links to the front page with the same text)
collapses to one combined row per map task before the exchange.
"""

from pyspark.sql import DataFrame, functions as F

from ideacrawler_spark.functions.extract import extract_links_udf
from ideacrawler_spark.functions.urlnorm import resolve_canon_udf


def anchor_corpus(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(target, atext, n) over a (url, html) pages frame: every anchor's
    resolved+canonicalized target URL and TrimSpace'd inner text, with
    exact pair counts. Unresolvable hrefs (Go url.Parse errors) and
    empty anchor texts are dropped."""
    links = pages.select(
        F.col(url_col).alias("_page"),
        F.explode(extract_links_udf()(F.col(html_col))).alias("_l"),
    ).filter(F.col("_l.anchor") != "")  # BEFORE the resolve UDF: empty-
    # anchor links never cross the Python boundary (resolve_canon_udf is
    # non-deterministic, so Catalyst would no longer push this for us)
    resolved = links.select(
        resolve_canon_udf()(F.col("_page"), F.col("_l.href"))
        .getField("url_norm").alias("target"),
        F.col("_l.anchor").alias("atext"),
    )
    return (
        resolved.filter(F.col("target").isNotNull())
        .groupBy("target", "atext")
        .agg(F.count("*").cast("long").alias("n"))
    )
