"""Golden vectors for reference URL-normalization parity.

The reference pipeline is Go url.Parse → purell.NormalizeURL(FlagsSafe) →
urlesc.Escape (job.go:821-832). Key consequences, each exercised below:
the escape flags act through parse-decode + urlesc-re-encode (path and
fragment only), the QUERY is emitted verbatim (urlesc.go:170-173), hosts
are lowercased but never IDNA/width/NFC-normalized (NormalizeURL, not
NormalizeURLString — purell.go:152-184), and URLs Go's url.Parse rejects
come back as None (the reference skips those links, job.go:822-824)."""

import pytest

from ideacrawler_spark.functions.urlnorm import (
    canonicalize,
    canonicalize_series,
    go_rejects_ref,
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
    # path escapes: uppercased via decode+re-encode (urlesc encodePath)
    ("http://example.com/a%3fb", "http://example.com/a%3Fb"),
    # unnecessary path escapes decoded (%41='A', %7E='~', %34='4')
    ("http://example.com/%41%7e/%34%32", "http://example.com/A~/42"),
    # necessary path chars encoded (space, non-ascii)
    ("http://example.com/a b", "http://example.com/a%20b"),
    ("http://example.com/año", "http://example.com/a%C3%B1o"),
    # FlagRemoveEmptyQuerySeparator
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a?x=1", "http://example.com/a?x=1"),
    # fragments are KEPT by FlagsSafe (decoded + re-encoded per urlesc)
    ("http://example.com/a#sec", "http://example.com/a#sec"),
    ("http://example.com/a#s%41c", "http://example.com/a#sAc"),
    # empty fragment dropped (urlesc omits empty fragments)
    ("http://example.com/a#", "http://example.com/a"),
    # dot segments NOT removed by FlagsSafe (removed at resolution only)
    ("http://example.com/a/../b", "http://example.com/a/../b"),
    # QUERY IS VERBATIM: urlesc emits u.RawQuery untouched, so escapes are
    # NOT uppercased/decoded there (urlesc.go:170-173)
    ("http://example.com/a?k=%3d", "http://example.com/a?k=%3d"),
    ("http://example.com/a?k=%41", "http://example.com/a?k=%41"),
    # NO IDNA: the reference calls NormalizeURL (purell.go:177), so the
    # host is lowercased but never punycoded
    ("http://Müller.example/a", "http://müller.example/a"),
    # preserved port + userinfo
    ("http://user:pw@Example.com:81/x", "http://user:pw@example.com:81/x"),
    # empty port separator is kept (FlagRemoveEmptyPortSeparator not in
    # FlagsSafe; Go validOptionalPort allows ':')
    ("http://example.com:/a", "http://example.com:/a"),
    # opaque URLs render as scheme:opaque (urlesc.go:152-156)
    ("mailto:Bob@Example.com", "mailto:Bob@Example.com"),
    ("javascript:void(0)", "javascript:void(0)"),
]


@pytest.mark.parametrize("raw,expected", SAFE_CASES)
def test_canonicalize_safe(raw, expected):
    assert canonicalize(raw) == expected


# Go url.Parse rejects these; the reference skips the link (job.go:822-824)
REJECT_CASES = [
    "http://example.com/a%zzb",      # malformed path escape
    "http://example.com/a#f%zz",     # malformed fragment escape
    "http://example.com:8x/a",       # invalid port
    "http://example.com/a\x00b",     # control character
]


@pytest.mark.parametrize("raw", REJECT_CASES)
def test_canonicalize_rejects(raw):
    assert canonicalize(raw) is None


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
    # absolute hrefs with a scheme pass through (opaque or hierarchical)
    ("http://h.example/a/b", "mailto:x@y.z", "mailto:x@y.z"),
    # Go rejects a schemeless ref with ':' in the first path segment
    # ("first path segment in URL cannot contain colon") — skipped
    ("http://h.example/a/b", "1a:b", None),
    # 'video.mp4' is a syntactically valid scheme (alpha then alnum/+-.),
    # so Go parses this as an opaque absolute URL, not a relative path
    ("http://h.example/a/b", "video.mp4:stream", "video.mp4:stream"),
]


@pytest.mark.parametrize("base,href,expected", RESOLVE_CASES)
def test_resolve_and_canonicalize(base, href, expected):
    assert resolve_and_canonicalize(base, href) == expected


def test_go_rejects_ref_shapes():
    assert go_rejects_ref("1a:b") is True
    assert go_rejects_ref("a/b:c") is False       # colon not in FIRST segment
    assert go_rejects_ref("/x:y") is False        # rooted path is fine
    assert go_rejects_ref("mailto:x") is False    # valid scheme
    assert go_rejects_ref("x?q=a:b") is False     # colon in query


def test_canonicalize_series_matches_scalar():
    import pandas as pd

    raws = [c[0] for c in SAFE_CASES] + REJECT_CASES + [
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
    # Go Hostname() on the raw seed URL preserves case — the SEED side of
    # the cross-domain compare (worker.go:100-112)
    assert host_raw("http://UP.Example:8080/x") == "UP.Example"
    assert host_raw("http://u:p@H.ex/x") == "H.ex"
