"""Unit test for the anchor-text corpus op (textops/anchors.py):
real tokenizer parse + resolve/canonicalize, exact pair counts."""

from ideacrawler_spark.textops.anchors import anchor_corpus


def test_anchor_corpus_parse_resolve_count(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.example/p/1",
             b'<a href="/x">go</a><a href="/x">go</a>'
             b'<a href="http://b.example/y">B</a>'
             b'<a href="/z">  </a>'),          # whitespace anchor dropped
            ("http://a.example/p/2", b'<a href="/x"> go </a>'),  # trimmed
        ],
        "url string, html binary",
    )
    got = {(r["target"], r["atext"]): r["n"]
           for r in anchor_corpus(pages).collect()}
    assert got == {
        ("http://a.example/x", "go"): 3,
        ("http://b.example/y", "B"): 1,
    }
