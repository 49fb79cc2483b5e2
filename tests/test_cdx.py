"""CDXJ index source: SURT transform edge cases, parser tolerance,
writer/parser round-trip, prefix lookup."""

from pyspark.sql import functions as F

from ideacrawler_spark.sources.cdx import (
    cdx_lookup,
    cdxj_lines,
    parse_cdxj,
    surt_col,
)


def _surts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["s"] for r in df.select(surt_col(F.col("url")).alias("s")).collect()]


def test_surt_transform_edge_cases(spark):
    got = _surts(spark, [
        "http://www.Example.ORG/A/B.html",     # www-strip + lowercase
        "https://cdn.example.org:8080/x",       # port kept
        "http://example.org:80/x",              # default port dropped
        "http://example.org/p?b=2&a=1&c=0",     # query params sorted
        "http://example.org",                   # empty path -> /
        "http://example.org/page#Frag",         # fragment dropped
    ])
    assert got == [
        "org,example)/a/b.html",
        "org,example,cdn:8080)/x",
        "org,example)/x",
        "org,example)/p?a=1&b=2&c=0",
        "org,example)/",
        "org,example)/page",
    ]


def test_parse_cdxj_skips_malformed_lines(spark):
    lines = spark.createDataFrame(
        [
            ('org,example)/ 20240101000000 {"url":"http://example.org/",'
             '"status":200,"mime":"text/html","digest":"d","length":10}',),
            ("not-a-cdx-line",),
            ('org,x)/ notanumber {"url":"u","status":200}',),
            ('org,x)/ 20240101000001 {broken json',),
        ],
        "line string",
    )
    rows = parse_cdxj(lines).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["surt"] == "org,example)/"
    assert r["ts"] == 20240101000000
    assert r["status"] == 200 and r["length"] == 10


def test_cdxj_round_trip_and_lookup(spark):
    caps = spark.createDataFrame(
        [
            ("http://www.a.example.org/Doc/1?z=1&a=2", 20240101000001, 200,
             "text/html", "d1", 100),
            ("http://b.example.org/x", 20240101000002, 404,
             "text/html", "d2", 50),
            ("http://other.net/y", 20240101000003, 200, "text/plain", "d3", 7),
        ],
        "url string, ts long, status int, mime string, digest string, length long",
    )
    parsed = parse_cdxj(cdxj_lines(caps))
    assert parsed.count() == 3
    hits = cdx_lookup(parsed, "org,example,").orderBy("ts").collect()
    assert [h["surt"] for h in hits] == [
        "org,example,a)/doc/1?a=2&z=1",
        "org,example,b)/x",
    ]
    # full payload survives the round trip
    assert hits[0]["url"] == "http://www.a.example.org/Doc/1?z=1&a=2"
    assert hits[1]["status"] == 404 and hits[1]["length"] == 50
