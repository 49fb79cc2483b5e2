"""robots.txt allow/deny with temoto/robotstxt-go semantics.

Reference behavior (/root/reference/vendor/github.com/temoto/robotstxt-go/
robotstxt.go:63-231, parser.go:155-198; consulted per fetch at
fetch.go:401,422-425,457-474):

- group selection (FindGroup, robotstxt.go:160-181): the group whose
  (lowercased) User-agent is the longest prefix of the client UA wins;
  ``*`` starts as the candidate with prefixLen **1**, and a named group
  must be STRICTLY longer to displace it — so a 1-char named UA loses
  to ``*``;
- path rule (findRule, robotstxt.go:183-231): among matching rules the
  greatest match length wins with STRICT ``>`` — the FIRST rule in file
  order wins ties. A wildcard rule matches via unanchored regex search
  (Go MatchString) and its match length is the length of the COMPILED
  regex string (QuoteMeta, then star->'.*' and dollar unescaped). A plain rule
  is a prefix match with its own length. A literal ``/`` rule is the
  weakest match (length 1, only when nothing matched yet) and applies
  even to an empty path;
- rule-path normalization happens at PARSE time (parser.go:183-192
  returnPathVal): a value starting with neither ``*`` nor ``/`` gets a
  leading ``/``; trailing ``*`` runs are stripped; the rule becomes a
  wildcard only if ``*``/``$`` remain AFTER that. ``compile_rules``
  re-applies this normalization so hand-written rule tables behave like
  parsed ones;
- no matching rule → ALLOW (Group.Test, robotstxt.go:185-192);
- robots fetch status (FromStatusAndBytes, robotstxt.go:63-85): 2xx →
  parse body, 4xx → allow everything, 5xx → disallow everything, any
  other status or a parse error → FromResponse error → ``agent == nil``
  → allow everything (fetch.go:457-474);
- matching runs against the DECODED URL path (Go u.Path), per
  fetch.go:401 ``agent.Test(v.URL().Path)`` — the engine decodes
  %-escapes before matching (ASCII rule patterns assumed).

The engine consumes a ``robots`` table
(host, user_agent, rule_path, allow, crawl_delay, fetch_status, rule_seq)
and evaluates rules in a vectorized pandas UDF against frontier paths
after a per-host join (broadcast when the robots dim is small).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple
from urllib.parse import unquote

import pandas as pd

# A compiled rule: (match_len, allow, kind, payload)
#   kind 'prefix' → payload is the literal prefix string
#   kind 'slash'  → the literal '/' weakest-match rule (payload None)
#   kind 'regex'  → payload is a compiled regex (UNANCHORED search)
#   kind 'all'    → disallow-all sentinel (5xx robots)
Rule = Tuple[int, bool, str, object]

# Go regexp.QuoteMeta special characters.
_GO_REGEX_SPECIAL = frozenset("\\.+*?()|[]{}^$")


def _quote_meta(s: str) -> str:
    return "".join("\\" + c if c in _GO_REGEX_SPECIAL else c for c in s)


def go_pattern_translate(pattern: str) -> str:
    """The exact regex STRING robotstxt-go builds (parser.go:193-198):
    QuoteMeta, then ``\\*`` → ``.*`` and ``\\$`` → ``$``. Its length is the
    rule's match length in findRule."""
    return _quote_meta(pattern).replace(r"\*", ".*").replace(r"\$", "$")


def normalize_rule_path(path: str) -> str:
    """returnPathVal normalization (parser.go:183-192): leading '/' unless
    the value starts with '*' or '/', then strip trailing '*' runs."""
    if path and not path.startswith("*") and not path.startswith("/"):
        path = "/" + path
    if path.endswith("*"):
        path = path.rstrip("*")
    return path


@lru_cache(maxsize=65536)
def _compile_pattern(translated: str):
    return re.compile(translated)


def compile_rules(
    rules: Sequence[Tuple[str, bool]], fetch_status: int = 200
) -> Optional[List[Rule]]:
    """Compile one host-group's (rule_path, allow) list, in FILE ORDER.

    Returns None for 'allow everything' (4xx robots, unexpected status),
    [] is a valid empty ruleset (also allow-all), and a sentinel
    [(1<<30, False, 'all', None)] for 5xx disallow-all."""
    if 400 <= fetch_status < 500:
        return None  # 4xx ⇒ allow all (robotstxt.go:73-75)
    if 500 <= fetch_status < 600:
        return [(1 << 30, False, "all", None)]  # 5xx ⇒ disallow all
    if not (200 <= fetch_status < 300):
        return None  # "Unexpected status" error ⇒ agent nil ⇒ allow all
    compiled: List[Rule] = []
    for path, allow in rules:
        if path is None:
            continue
        path = normalize_rule_path(path)
        if not path:
            # Go keeps a rule with empty path but HasPrefix len 0 can never
            # win a strict-> contest — equivalent to dropping it. (This also
            # covers the marker rows rule_path='' emitted for rule-less
            # groups.)
            continue
        if "*" in path or "$" in path:
            translated = go_pattern_translate(path)
            compiled.append(
                (len(translated), bool(allow), "regex", _compile_pattern(translated))
            )
        elif path == "/":
            compiled.append((1, bool(allow), "slash", None))
        else:
            compiled.append((len(path), bool(allow), "prefix", path))
    return compiled


def select_group(groups: dict, user_agent: str) -> object:
    """FindGroup (robotstxt.go:160-181): '*' is the starting candidate with
    prefixLen 1; a named group needs a STRICTLY longer prefix match of the
    lowercased client UA to win. ``groups`` maps user_agent → payload."""
    ua = user_agent.lower()
    best_key, best_len = None, 0
    for key in groups:
        if key.lower() == "*":
            if best_len == 0:
                best_key, best_len = key, 1
    for key in groups:
        k = key.lower()
        if k != "*" and ua.startswith(k) and len(k) > best_len:
            best_key, best_len = key, len(k)
    return groups.get(best_key) if best_key is not None else None


def allowed(rules: Optional[List[Rule]], path: str) -> bool:
    """findRule (robotstxt.go:183-231): greatest match length wins, strict
    '>' so the FIRST rule in file order wins ties; default allow."""
    if rules is None:
        return True
    if path is None:
        path = ""
    best_len, best_allow = 0, True
    for match_len, allow, kind, payload in rules:
        if kind == "all":
            return False
        if kind == "regex":
            if payload.search(path) is not None and match_len > best_len:
                best_len, best_allow = match_len, allow
        elif kind == "slash":
            # weakest match possible; applies even to an empty path and
            # only when nothing has matched yet (strict '>' keeps it)
            if best_len == 0:
                best_len, best_allow = 1, allow
        else:
            if path.startswith(payload) and match_len > best_len:
                best_len, best_allow = match_len, allow
    return best_allow


def decoded_path(url_path: str) -> str:
    """Go u.Path is %-decoded; robots matching runs on the decoded form."""
    if not url_path or "%" not in url_path:
        return url_path or ""
    try:
        return unquote(url_path, errors="replace")
    except Exception:  # noqa: BLE001 — malformed sequences stay raw
        return url_path


def allowed_series(paths: pd.Series, rules_col: pd.Series) -> pd.Series:
    """Vectorized evaluation: rules_col holds per-row rule lists as
    list[dict(rule_path, allow, fetch_status, rule_seq)] | None — the shape
    produced by sort_array(collect_list(struct(...))) after the host join.
    The array arrives sorted by rule_seq, i.e. in file order."""
    out = []
    cache = {}
    for path, rules in zip(paths, rules_col):
        if rules is None or (hasattr(rules, "__len__") and len(rules) == 0):
            out.append(True)
            continue
        rl = list(rules)
        key = tuple(
            (r["rule_path"], r["allow"], r.get("fetch_status", 200)) for r in rl
        )
        if key in cache:
            compiled = cache[key]
        else:
            status = rl[0].get("fetch_status", 200) if rl else 200
            compiled = compile_rules(
                [(r["rule_path"], r["allow"]) for r in rl], fetch_status=status
            )
            cache[key] = compiled
        out.append(allowed(compiled, decoded_path(path)))
    return pd.Series(out, index=paths.index, dtype=bool)


def robots_allowed_udf():
    """pandas UDF (path, rules array<struct>) → boolean."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _allowed(paths: pd.Series, rules: pd.Series) -> pd.Series:
        return allowed_series(paths, rules)

    return _allowed
