"""WARC ingestion (Common-Crawl-style source format, BASELINE.json input
shape): build→parse roundtrip, Spark mapInPandas path, and a full crawl
over WARC-derived pages matching the reference simulator."""

import hashlib

from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.plans.crawl import CrawlEngine
from ideacrawler_spark.refsim import simulate
from ideacrawler_spark.sources.warc import (
    build_warc,
    html_to_text,
    parse_warc,
    warc_to_pages,
)


def test_warc_roundtrip_pure():
    from ideacrawler_spark.sources.fixtures import synth_web

    pages, _, _, _ = synth_web(seed=42, scale=1)
    blob = build_warc(pages)
    parsed = parse_warc(blob)
    assert len(parsed) == len(pages)  # request records skipped
    for orig, got in zip(pages, parsed):
        assert got["url"] == orig["url"]
        assert got["status"] == orig["status"]
        assert got["content_type"] == orig["content_type"]
        assert got["html"] == orig["html"]  # byte-exact through the archive
        assert got["warc_ts"] == orig["warc_ts"]
        assert got["text"] == html_to_text(orig["html"])
        assert got["lang"] == ""


def test_warc_tolerates_truncation_and_garbage():
    from ideacrawler_spark.sources.fixtures import synth_web

    pages, _, _, _ = synth_web(seed=42, scale=1)
    blob = build_warc(pages[:5])
    # truncated archive: parse what is intact, never raise
    assert 0 < len(parse_warc(blob[: len(blob) // 2])) <= 5
    assert parse_warc(b"") == []
    assert parse_warc(b"not a warc at all") == []
    # leading garbage before the first record is skipped
    assert len(parse_warc(b"GARBAGE" + blob)) == 5


def test_warc_to_pages_spark(spark):
    from ideacrawler_spark.sources.fixtures import synth_web

    pages, _, _, _ = synth_web(seed=42, scale=1)
    # split across two "files" like a CC segment listing
    half = len(pages) // 2
    rows = [("f1.warc", bytearray(build_warc(pages[:half]))),
            ("f2.warc", bytearray(build_warc(pages[half:])))]
    files_df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["url"]: r for r in warc_to_pages(files_df).collect()}
    assert len(got) == len(pages)
    for p in pages:
        r = got[p["url"]]
        assert bytes(r["html"]) == p["html"]
        assert r["status"] == p["status"]
        assert hashlib.md5(bytes(r["html"])).hexdigest() == \
            hashlib.md5(p["html"]).hexdigest()


def test_crawl_from_warc_matches_refsim(spark, web):
    """The full engine over a WARC-derived pages table must equal the
    simulator over the equivalent page dicts — the archive is just
    another source for the same crawl."""
    pages, robots, seeds, _ = web
    # the pages-table text contract for WARC ingest is the tag-stripped
    # html (fixture dicts carry a different synthetic text column)
    pages_txt = [dict(p, text=html_to_text(p["html"])) for p in pages]
    blob = build_warc(pages_txt)
    files_df = spark.createDataFrame(
        [("all.warc", bytearray(blob))], "path string, content binary")
    pages_df = warc_to_pages(files_df)

    from ideacrawler_spark.sources.fixtures import ROBOTS_SCHEMA

    spec = JobSpec(job_id="warc", seed_url="http://hosta.example/p/0",
                   min_delay_s=1, round_seconds=10, max_concurrent=5,
                   depth=2)
    golden = simulate(spec, pages_txt, robots, None)
    got = CrawlEngine(spark, spec, pages_df,
                      spark.createDataFrame(robots, ROBOTS_SCHEMA),
                      shuffle_partitions=8).run()
    order = [(r["fetch_seq"], r["url"]) for r in
             got["order"].orderBy("fetch_seq").collect()]
    want = [(o["fetch_seq"], o["url"]) for o in golden.order]
    assert order == want
    texts = {r["url"]: r["text"] for r in got["shipped"].collect()}
    want_texts = {s["url"]: s["text"] for s in golden.shipped}
    assert texts == want_texts  # byte-identical text through the archive


def test_pages_to_warc_shards_roundtrip_and_determinism(spark):
    from ideacrawler_spark.sources.fixtures import synth_web
    from ideacrawler_spark.sources.warc import (
        pages_to_warc_shards,
        warc_to_pages,
    )

    pages, _, _, _ = synth_web(seed=7, scale=1)
    df = spark.createDataFrame(
        [(p["url"], p["warc_ts"], bytearray(p["html"]), p["status"],
          p["content_type"]) for p in pages],
        "url string, warc_ts timestamp, html binary, status int, "
        "content_type string",
    )
    shards = pages_to_warc_shards(df.repartition(5), n_shards=3)
    rows = shards.collect()
    assert sorted(r["path"] for r in rows) == [
        "part-%05d.warc" % i for i in range(len(rows))]
    back = warc_to_pages(shards).collect()
    got = {(r["url"], r["status"], bytes(r["html"])) for r in back}
    want = {(p["url"], p["status"], p["html"]) for p in pages}
    assert got == want
    # byte-determinism: same membership -> same shard bytes, regardless
    # of input partitioning
    again = {r["path"]: bytes(r["content"])
             for r in pages_to_warc_shards(df.repartition(2),
                                           n_shards=3).collect()}
    first = {r["path"]: bytes(r["content"]) for r in rows}
    assert again == first
