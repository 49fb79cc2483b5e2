"""Page-level robots directives (functions/directives.py)."""
from ideacrawler_spark.functions.directives import page_directives


def test_meta_robots_tokens():
    h = b'<head><meta name="robots" content="noindex, nofollow"></head>'
    assert page_directives(h) == (True, True, None)
    h = b'<head><meta name="ROBOTS" content="NONE"></head>'
    assert page_directives(h) == (True, True, None)
    h = b'<head><meta name="robots" content=" nofollow "></head>'
    assert page_directives(h) == (False, True, None)


def test_bot_specific_meta():
    h = b'<head><meta name="googlebot" content="noindex"></head>'
    assert page_directives(h) == (False, False, None)
    assert page_directives(h, bot="googlebot") == (True, False, None)


def test_x_robots_tag_ors_in():
    h = b"<head></head>"
    assert page_directives(h, "noindex") == (True, False, None)
    h = b'<head><meta name="robots" content="nofollow"></head>'
    assert page_directives(h, "noindex") == (True, True, None)


def test_canonical_first_wins_and_rel_tokens():
    h = (b'<head><link rel="canonical" href="/a"><link rel="canonical" '
         b'href="/b"></head>')
    assert page_directives(h)[2] == "/a"
    h = b'<head><link rel="stylesheet canonical" href="/c"></head>'
    assert page_directives(h)[2] == "/c"
    h = b'<head><link rel="stylesheet" href="/d"></head>'
    assert page_directives(h)[2] is None


def test_malformed_html_is_safe():
    assert page_directives(b'<meta name="robots" content="noindex') \
        == (False, False, None)
    assert page_directives(None) == (False, False, None)
    assert page_directives(b"\xff\xfe\x00garbage") == (False, False, None)
