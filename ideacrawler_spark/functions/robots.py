"""robots.txt allow/deny with temoto/robotstxt-go semantics.

Reference behavior (/root/reference/vendor/github.com/temoto/robotstxt-go/
robotstxt.go:63-231, parser.go:122-198; consulted per fetch at
fetch.go:401,422-425,457-474):

- group selection: the group whose User-agent is the LONGEST prefix of the
  client UA wins; ``*`` is the weakest match (robotstxt.go:162-183);
- path rule: among all rules of the group whose pattern matches the path,
  the one with the greatest pattern LENGTH wins (wildcard patterns count
  their literal pattern length); tie → allow wins is not specified — the
  Go code keeps the longest and on equal length the later rule overwrites;
  we replicate longest-wins with later-overwrites-on-tie;
- ``*`` matches any char sequence, ``$`` anchors the end
  (parser.go:167-198); plain patterns are prefix matches;
- no matching rule → ALLOW (robotstxt.go:185-231);
- robots fetch status: 4xx → allow everything, 5xx → disallow everything,
  parse error → allow everything (robotstxt.go:63-85).

The engine consumes a ``robots`` table
(host, user_agent, rule_path, allow, crawl_delay, fetch_status) and
evaluates rules in a vectorized pandas UDF against frontier paths after a
per-host join (broadcast when the robots dim is small).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import pandas as pd

# A compiled rule: (match_len, allow, kind, payload)
#   kind 'prefix' → payload is the literal prefix string
#   kind 'regex'  → payload is a compiled regex (anchored at start)
Rule = Tuple[int, bool, str, object]


@lru_cache(maxsize=65536)
def _compile_pattern(pattern: str):
    """Wildcard robots pattern → anchored regex (parser.go:167-198)."""
    out = ["^"]
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append("$")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out))


def compile_rules(
    rules: Sequence[Tuple[str, bool]], fetch_status: int = 200
) -> Optional[List[Rule]]:
    """Compile one host-group's (rule_path, allow) list.

    Returns None for 'allow everything' (incl. 4xx robots), [] is a valid
    empty ruleset (also allow-all), and a sentinel [(0, False, 'all', None)]
    for 5xx disallow-all."""
    if 400 <= fetch_status < 500:
        return None  # 4xx ⇒ allow all (robotstxt.go:63-85)
    if 500 <= fetch_status < 600:
        return [(1 << 30, False, "all", None)]  # 5xx ⇒ disallow all
    compiled: List[Rule] = []
    for path, allow in rules:
        if not path:
            continue
        if "*" in path or "$" in path:
            compiled.append((len(path), bool(allow), "regex", _compile_pattern(path)))
        else:
            compiled.append((len(path), bool(allow), "prefix", path))
    return compiled


def select_group(groups: dict, user_agent: str) -> object:
    """Longest UA-prefix group wins; '*' weakest (robotstxt.go:162-183).

    ``groups`` maps user_agent-string → rules payload."""
    ua = user_agent.lower()
    best_key, best_len = None, -1
    for key in groups:
        k = key.lower()
        if k == "*":
            if best_len < 0:
                best_key, best_len = key, 0
        elif ua.startswith(k) and len(k) > best_len:
            best_key, best_len = key, len(k)
    return groups.get(best_key) if best_key is not None else None


def allowed(rules: Optional[List[Rule]], path: str) -> bool:
    """Longest-match rule decides; default allow (robotstxt.go:185-231)."""
    if rules is None:
        return True
    if not path:
        path = "/"
    best_len, best_allow = -1, True
    for match_len, allow, kind, payload in rules:
        if kind == "all":
            return False
        if kind == "prefix":
            if not path.startswith(payload):
                continue
        else:
            if payload.match(path) is None:
                continue
        if match_len >= best_len:  # later rule overwrites on tie (Go behavior)
            best_len, best_allow = match_len, allow
    return best_allow


def allowed_series(paths: pd.Series, rules_col: pd.Series) -> pd.Series:
    """Vectorized evaluation: rules_col holds per-row rule lists as
    list[dict(rule_path, allow)] | None with an attached fetch_status —
    the shape produced by collect_list(struct(...)) after the host join."""
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
        out.append(allowed(compiled, path))
    return pd.Series(out, index=paths.index, dtype=bool)


def robots_allowed_udf():
    """pandas UDF (path, rules array<struct>) → boolean."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _allowed(paths: pd.Series, rules: pd.Series) -> pd.Series:
        return allowed_series(paths, rules)

    return _allowed
