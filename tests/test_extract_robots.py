"""Unit tests: link extraction (job.go:816-825) and robots semantics
(robotstxt.go:185-231, parser.go:167-198)."""

from ideacrawler_spark.functions.extract import extract_links
from ideacrawler_spark.functions.robots import allowed, compile_rules, select_group


def test_extract_document_order_and_trim():
    html = (
        b'<html><body><a href="/a"> one </a>'
        b'<p>x</p><a class="z" href="b/c"><b>two</b> bold </a>'
        b'<a href="/a">  one again\n</a>'
        b"<a nohref>skipped</a></body></html>"
    )
    links = extract_links(html)
    assert links == [("/a", "one"), ("b/c", "two bold"), ("/a", "one again")]


def test_extract_empty_and_none():
    assert extract_links(None) == []
    assert extract_links(b"<html></html>") == []


def test_robots_longest_match_wins():
    rules = compile_rules([("/p/", False), ("/p/public", True)])
    assert allowed(rules, "/p/public/x") is True
    assert allowed(rules, "/p/private") is False
    assert allowed(rules, "/other") is True  # default allow


def test_robots_wildcard_and_anchor():
    rules = compile_rules([("/tmp*", False), ("/a/*/b$", False)])
    assert allowed(rules, "/tmpfile") is False
    assert allowed(rules, "/tm") is True
    assert allowed(rules, "/a/x/b") is False
    assert allowed(rules, "/a/x/b/c") is True  # $ anchors


def test_robots_fetch_status():
    assert allowed(compile_rules([("/", False)], fetch_status=404), "/x") is True
    assert allowed(compile_rules([("/ok", True)], fetch_status=503), "/ok") is False


def test_robots_group_selection():
    groups = {"*": "star", "fetch": "prefix", "fetchbot": "exact"}
    assert select_group(groups, "Fetchbot") == "exact"
    assert select_group(groups, "fetchx") == "prefix"
    assert select_group(groups, "otherbot") == "star"
    assert select_group({}, "x") is None
