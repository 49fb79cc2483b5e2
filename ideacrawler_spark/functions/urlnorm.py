"""URL canonicalization with purell-FlagsSafe parity.

The reference normalizes every extracted link with
``purell.NormalizeURL(u, purell.FlagsSafe)`` (/root/reference/job.go:826-832);
FlagsSafe (vendor/.../purell/purell.go:59) is:

  FlagLowercaseScheme | FlagLowercaseHost | FlagUppercaseEscapes |
  FlagDecodeUnnecessaryEscapes | FlagEncodeNecessaryEscapes |
  FlagRemoveDefaultPort | FlagRemoveEmptyQuerySeparator

and the host is additionally width-folded, NFC-normalized and IDNA-ASCII
encoded (purell.go:162-170). With UnsafeNormalizeURL the reference adds
FlagRemoveFragment | FlagRemoveDirectoryIndex and clears RawQuery entirely
(job.go:826-831).

Reference resolution of an href against the page URL is Go's
``requestURL.Parse(val)`` (job.go:821) — RFC 3986; Python's ``urljoin``
implements the same algorithm (dot-segment removal happens at resolution
time, NOT at normalization time — FlagsSafe does not remove dot segments).

Spark integration: ``canonicalize_udf`` is an Arrow-batched pandas UDF
(no row-at-a-time Python UDF registration); within a batch, values are
processed with a vectorized fast path for already-canonical URLs and a
per-value slow path for the rest.
"""

from __future__ import annotations

import re
import unicodedata
from urllib.parse import urljoin, urlsplit

import pandas as pd

try:  # idna is available in the sandbox; fall back gracefully elsewhere
    import idna as _idna
except ImportError:  # pragma: no cover
    _idna = None

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")
# Per-component characters Go's urlesc leaves unescaped beyond unreserved.
# (sub-delims plus the component-specific extras of RFC 3986.)
_SAFE_PATH = frozenset("!$&'()*+,;=:@/%")
_SAFE_QUERY = frozenset("!$&'()*+,;=:@/?%")
_SAFE_FRAGMENT = frozenset("!$&'()*+,;=:@/?%")
_DEFAULT_PORTS = {"http": "80", "https": "443"}
# purell FlagRemoveDirectoryIndex (purell.go:48, rxDirIndex)
_RX_DIR_INDEX = re.compile(r"(^|/)((?:default|index)\.\w{1,4})$")


def _norm_escapes(s: str, safe: frozenset) -> str:
    """Uppercase %XX, decode unnecessary escapes, encode necessary chars.

    Implements FlagUppercaseEscapes + FlagDecodeUnnecessaryEscapes +
    FlagEncodeNecessaryEscapes for one URL component.
    """
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            byte = int(s[i + 1 : i + 3], 16)
            ch = chr(byte)
            if ch in _UNRESERVED:
                out.append(ch)          # decode unnecessary escape
            else:
                out.append("%%%02X" % byte)  # uppercase escape
            i += 3
        elif c in _UNRESERVED or c in safe:
            out.append(c)
            i += 1
        else:  # encode necessary escape (UTF-8 percent-encoding)
            out.append("".join("%%%02X" % b for b in c.encode("utf-8")))
            i += 1
    return "".join(out)


def _fold_width(s: str) -> str:
    """Unicode width folding (purell.go:162-170 uses width.Fold):
    fullwidth/halfwidth forms → canonical. NFKC on the wide/narrow classes
    only; approximated here by per-char NFKC for chars with W/F/H east-asian
    width decompositions, which is what width.Fold does for URLs."""
    out = []
    for ch in s:
        if unicodedata.east_asian_width(ch) in ("F", "H", "W"):
            out.append(unicodedata.normalize("NFKC", ch))
        else:
            out.append(ch)
    return "".join(out)


def _norm_host(host: str) -> str:
    """Lowercase + width-fold + NFC + IDNA-ASCII (purell.go:162-170)."""
    host = host.strip()
    if not host:
        return host
    host = _fold_width(host)
    host = unicodedata.normalize("NFC", host)
    host = host.lower()
    if _idna is not None and any(ord(c) > 127 for c in host):
        try:
            host = _idna.encode(host, uts46=True).decode("ascii")
        except _idna.IDNAError:
            pass  # keep as-is; Go's idna is similarly lenient for bad labels
    return host


def canonicalize(url: str, unsafe: bool = False) -> str:
    """purell-FlagsSafe canonical form of an absolute URL.

    ``unsafe=True`` adds FlagRemoveFragment + FlagRemoveDirectoryIndex and
    strips the query entirely (job.go:826-831).
    """
    if url is None:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = _norm_host(parts.hostname or "")
    port = parts.port
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password is not None:
            userinfo += ":" + parts.password
        userinfo += "@"
    netloc = userinfo + host
    if port is not None and _DEFAULT_PORTS.get(scheme) != str(port):
        netloc += ":%d" % port
    path = _norm_escapes(parts.path, _SAFE_PATH)
    query = _norm_escapes(parts.query, _SAFE_QUERY)
    fragment = _norm_escapes(parts.fragment, _SAFE_FRAGMENT)
    if unsafe:
        fragment = ""
        query = ""           # u.RawQuery = "" (job.go:830)
        path = _RX_DIR_INDEX.sub(r"\1", path)
    out = scheme + "://" + netloc + path if scheme else netloc + path
    if query:
        out += "?" + query
    # FlagRemoveEmptyQuerySeparator: a bare trailing '?' is dropped.
    if fragment:
        out += "#" + fragment
    # An empty '#' is dropped too (Go url.URL.String() omits it).
    return out


def resolve_and_canonicalize(base_url: str, href: str, unsafe: bool = False) -> str | None:
    """RFC 3986 reference resolution (Go requestURL.Parse ≡ urljoin),
    then canonicalization. Returns None for unresolvable hrefs."""
    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        return None
    return canonicalize(absolute, unsafe=unsafe)


def host_of(url: str) -> str:
    """u.Hostname() (worker.go:100-106, job.go:842): lowercase, no port."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


# --------------------------------------------------------------------------
# Vectorized pandas paths (Arrow-batched; used from mapInPandas/pandas UDFs)
# --------------------------------------------------------------------------

# Fast-path detector: scheme+host already lowercase ASCII, no %-escapes, no
# default port, no trailing '?', no fragment, no userinfo, no uppercase.
_RX_ALREADY_CANONICAL = re.compile(
    r"^https?://[a-z0-9.-]+[a-z0-9\-._~!$&'()*+,;=@/]*$"  # no ':' ⇒ no port/userinfo
)


def canonicalize_series(urls: pd.Series, unsafe: bool = False) -> pd.Series:
    """Vectorized canonicalization of a string Series.

    Already-canonical URLs (the common case for a well-behaved frontier)
    pass through via one compiled-regex match (the character class excludes
    '%', '?' and uppercase, so a match IS a proof of canonical form); only
    dirty URLs take the per-value slow path. One pass, no Series copies —
    this is the hot path of the whole engine."""
    fast = _RX_ALREADY_CANONICAL.match
    if unsafe:
        out = [
            canonicalize(u, unsafe=True) if isinstance(u, str) else None
            for u in urls
        ]
    else:
        out = [
            u if (isinstance(u, str) and fast(u) is not None)
            else (canonicalize(u) if isinstance(u, str) else None)
            for u in urls
        ]
    return pd.Series(out, index=urls.index, dtype=object)


def canonicalize_udf(unsafe: bool = False):
    """Build the pandas UDF (string → string). Import of pyspark is local so
    the pure-Python functions above stay usable without a Spark runtime."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _canon(urls: pd.Series) -> pd.Series:
        return canonicalize_series(urls, unsafe=unsafe)

    return _canon


def host_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _host(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: host_of(u) if u is not None else None)

    return _host


def host_raw(url: str) -> str:
    """Go url.Hostname(): strips port/userinfo but PRESERVES case —
    the cross-domain compare is case-sensitive (job.go:842-845)."""
    from urllib.parse import urlsplit as _us

    try:
        netloc = _us(url).netloc
    except ValueError:
        return ""
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if netloc.startswith("["):
        return netloc[1:].split("]", 1)[0]
    return netloc.split(":", 1)[0]


RESOLVED_SCHEMA = "struct<url_norm:string,host_raw:string,host:string>"


def resolve_canon_udf(unsafe: bool = False):
    """pandas UDF (base_url, href) → struct(url_norm, host_raw, host).

    One Arrow batch pass per partition performing Go requestURL.Parse
    (RFC 3986 urljoin) + purell normalization + both hostname flavors."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(RESOLVED_SCHEMA)
    def _resolve(base: pd.Series, href: pd.Series) -> pd.DataFrame:
        norms, raws, hosts = [], [], []
        for b, h in zip(base, href):
            try:
                absolute = urljoin(b, h)
                nurl = canonicalize(absolute, unsafe=unsafe)
                norms.append(nurl)
                raws.append(host_raw(absolute))
                hosts.append((urlsplit(nurl).hostname or "").lower())
            except (ValueError, AttributeError):
                norms.append(None)
                raws.append(None)
                hosts.append(None)
        return pd.DataFrame({"url_norm": norms, "host_raw": raws, "host": hosts})

    return _resolve
