"""Golden vectors for purell-FlagsSafe parity (FIXTURES.md canonicalize_cases).

Each case exercises one purell flag (vendor/.../purell/purell.go:28-59) or a
host-normalization rule (purell.go:162-170)."""

import pytest

from ideacrawler_spark.functions.urlnorm import (
    canonicalize,
    canonicalize_series,
    host_of,
    resolve_and_canonicalize,
)
from ideacrawler_spark.refsim import host_raw

SAFE_CASES = [
    # FlagLowercaseScheme / FlagLowercaseHost
    ("HTTP://WWW.Example.COM/Path", "http://www.example.com/Path"),
    # FlagRemoveDefaultPort
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # FlagUppercaseEscapes
    ("http://example.com/a%3fb", "http://example.com/a%3Fb"),
    # FlagDecodeUnnecessaryEscapes (%41='A', %7E='~', %34='4')
    ("http://example.com/%41%7e/%34%32", "http://example.com/A~/42"),
    # FlagEncodeNecessaryEscapes (space, non-ascii path char)
    ("http://example.com/a b", "http://example.com/a%20b"),
    ("http://example.com/año", "http://example.com/a%C3%B1o"),
    # FlagRemoveEmptyQuerySeparator
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a?x=1", "http://example.com/a?x=1"),
    # fragments are KEPT by FlagsSafe
    ("http://example.com/a#sec", "http://example.com/a#sec"),
    # empty fragment dropped (Go url.String() omits bare '#')
    ("http://example.com/a#", "http://example.com/a"),
    # dot segments NOT removed by FlagsSafe (removed at resolution only)
    ("http://example.com/a/../b", "http://example.com/a/../b"),
    # query escapes normalized too
    ("http://example.com/a?k=%3d", "http://example.com/a?k=%3D"),
    # IDNA host
    ("http://müller.example/a", "http://xn--mller-kva.example/a"),
    # preserved port + userinfo
    ("http://user:pw@Example.com:81/x", "http://user:pw@example.com:81/x"),
]


@pytest.mark.parametrize("raw,expected", SAFE_CASES)
def test_canonicalize_safe(raw, expected):
    assert canonicalize(raw) == expected


UNSAFE_CASES = [
    # FlagRemoveFragment
    ("http://example.com/a#sec", "http://example.com/a"),
    # RawQuery stripped entirely (job.go:830)
    ("http://example.com/a?x=1&y=2", "http://example.com/a"),
    # FlagRemoveDirectoryIndex
    ("http://example.com/dir/index.html", "http://example.com/dir/"),
    ("http://example.com/default.asp", "http://example.com/"),
    ("http://example.com/myindex.html", "http://example.com/myindex.html"),
]


@pytest.mark.parametrize("raw,expected", UNSAFE_CASES)
def test_canonicalize_unsafe(raw, expected):
    assert canonicalize(raw, unsafe=True) == expected


RESOLVE_CASES = [
    # RFC 3986 resolution incl. dot-segment removal (Go requestURL.Parse)
    ("http://h.example/a/b", "c", "http://h.example/a/c"),
    ("http://h.example/a/b", "/c", "http://h.example/c"),
    ("http://h.example/a/b", "../c", "http://h.example/c"),
    ("http://h.example/a/b", "./c#f", "http://h.example/a/c#f"),
    ("http://h.example/a/b", "//other.example/x", "http://other.example/x"),
    ("http://h.example/a/b", "HTTP://UP.example:80/Y", "http://up.example/Y"),
    ("http://h.example/a/b", "", "http://h.example/a/b"),
    ("http://h.example/x/../a/b", "c", "http://h.example/a/c"),
]


@pytest.mark.parametrize("base,href,expected", RESOLVE_CASES)
def test_resolve_and_canonicalize(base, href, expected):
    assert resolve_and_canonicalize(base, href) == expected


def test_canonicalize_series_matches_scalar():
    import pandas as pd

    raws = [c[0] for c in SAFE_CASES] + [
        "http://already.example/clean/path",
        "http://hosta.example/p/7",
        None,
    ]
    out = canonicalize_series(pd.Series(raws))
    for raw, got in zip(raws, out):
        if raw is None:
            assert got is None or got != got  # NaN-ish
        else:
            assert got == canonicalize(raw), raw


def test_host_helpers():
    assert host_of("http://UP.Example:8080/x") == "up.example"
    # Go Hostname() preserves case — the cross-domain quirk (job.go:842-845)
    assert host_raw("http://UP.Example:8080/x") == "UP.Example"
    assert host_raw("http://u:p@H.ex/x") == "H.ex"
