"""robots.txt TEXT parsing — temoto/robotstxt-go parser semantics.

The engine's politeness join consumes a per-host rules table; this module
produces that table from raw robots.txt bodies, replicating the reference
scanner + parser (vendor/.../robotstxt-go/scanner.go, parser.go):

- tokenizer (scanner.go:58-141): tokens split on space/tab/VT; '\\n'/'\\r'
  runs collapse into ONE newline token; '#' at a token start skips to end
  of line (a mid-token '#' is part of the token); the FIRST ':' on a line
  ends the key token (later ':' are literal, so absolute URLs survive);
- ``User-agent`` values are lowercased at parse time (parser.go:221-227);
  consecutive UA lines share ONE group; a Disallow/Allow/Crawl-delay line
  with a NON-EMPTY value closes the UA run; empty-value rule lines are
  lIgnore and do NOT close the run (parser.go:171-176,185-213); unknown
  keys (Host, Sitemap, anything else) never touch the group state
  (parser.go:115-121 + parseAll's missing lUnknown case);
- groups live in a MAP keyed by the lowercased agent (parser.go:48-57):
  an agent named in two separate runs accumulates rules from both, in
  file order; a later Crawl-delay OVERWRITES the agent's delay;
- rule values are normalized per returnPathVal (parser.go:183-192):
  leading '/' added unless the value starts with '*' or '/', trailing '*'
  runs stripped; wildcard compilation happens downstream
  (functions/robots.py) from the normalized value;
- ``useragent`` and ``crawldelay`` spellings are accepted (parser.go:
  220,247); Crawl-delay parses via ParseFloat — a bad float is a parse
  ERROR; so is any rule/delay line before the first User-agent
  (parser.go:86-127). ANY parse error fails the WHOLE file: FromBytes
  returns an error, getRobotAgent returns nil, and the host is
  allow-everything with the default delay (fetch.go:457-474) — modeled
  here as ``None``;
- an empty (whitespace-only) body is allowAll without parsing
  (robotstxt.go:103-109) — modeled as ``[]``;
- fetch-status semantics (4xx allow-all / 5xx disallow-all,
  robotstxt.go:63-85) stay the caller's job via the ``fetch_status``
  column.

``robots_table_from_text`` turns a DataFrame of (host, body, fetch_status)
into the engine's (host, user_agent, rule_path, allow, crawl_delay,
fetch_status, rule_seq) rows via one Arrow-batched pass. ``rule_seq`` is
the global file-order counter — downstream sorts on it so findRule's
first-rule-wins tie-break sees file order.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame

from ideacrawler_spark.functions.robots import normalize_rule_path

_WS = {" ", "\t", "\v"}
_EOL = {"\n", "\r"}


def _tokenize(body: str) -> List[str]:
    """byteScanner.Scan parity (scanner.go:58-141)."""
    tokens: List[str] = []
    i, n = 0, len(body)
    key_token_found = False
    while i < n:
        # skipSpace
        while i < n and body[i] in _WS:
            i += 1
        if i >= n:
            break
        c = body[i]
        if c in _EOL:
            key_token_found = False
            while i < n and body[i] in _EOL:
                i += 1
            tokens.append("\n")
            continue
        if c == "#":
            key_token_found = False
            while i < n and body[i] not in _EOL:
                i += 1
            while i < n and body[i] in _EOL:
                i += 1
            if i >= n:
                break
            tokens.append("\n")
            continue
        # scan one token; the first ':' on the line ends the KEY token
        start = i
        i += 1
        while i < n and body[i] not in _WS and body[i] not in _EOL:
            if body[i] == ":" and not key_token_found:
                break
            i += 1
        tok = body[start:i]
        if i < n and body[i] == ":" and not key_token_found:
            i += 1  # consume the ':'
            key_token_found = True
        tokens.append(tok)
    return tokens


class _ParseError(Exception):
    pass


def _parse_tokens(tokens: List[str]) -> dict:
    """parseAll parity (parser.go:59-153). Returns the groups map
    {lower_agent: {'rules': [(seq, path, allow)], 'delay': float}}.
    Raises _ParseError exactly where Go appends an error."""
    groups: dict = {}
    agents: List[str] = []
    is_empty_group = True
    rule_seq = 0
    pos = 0

    def ensure(agent: str) -> dict:
        g = groups.get(agent)
        if g is None:
            g = {"rules": [], "delay": 0.0}
            groups[agent] = g
        return g

    while pos < len(tokens):
        t1 = tokens[pos]
        pos += 1
        if pos > len(tokens) - 1:
            break  # EOF: t2 missing, token ignored (parseLine:158-163)
        t2 = tokens[pos]
        if t1 == "\n":
            continue  # don't consume t2
        key = t1.lower()
        if key in ("user-agent", "useragent"):
            pos += 1  # consume t2
            val = t2.lower()
            # returnStringVal: empty value ⇒ lIgnore (tokens are never
            # empty strings, but '\n' can land here and IS a value in Go)
            if not is_empty_group:
                agents = []
            if not agents:
                is_empty_group = True
            agents.append(val)
        elif key in ("disallow", "allow"):
            pos += 1
            # returnPathVal: non-empty value (incl. '\n') becomes a rule
            if not agents:
                raise _ParseError(f"{key} before User-agent")
            is_empty_group = False
            path = normalize_rule_path(t2)
            for a in agents:
                ensure(a)["rules"].append((rule_seq, path, key == "allow"))
            rule_seq += 1
        elif key in ("crawl-delay", "crawldelay"):
            pos += 1
            try:
                delay = float(t2)
            except ValueError as e:  # ParseFloat error fails the file
                raise _ParseError(str(e)) from e
            if not agents:
                raise _ParseError("Crawl-delay before User-agent")
            is_empty_group = False
            for a in agents:
                ensure(a)["delay"] = delay
        else:
            # host / sitemap / unknown: consume the value, touch nothing
            pos += 1
    # NOTE: an agent that never reached a Disallow/Allow/Crawl-delay line
    # never enters the groups map (parseGroupMap only runs on those lines)
    # — FindGroup cannot select it and falls through to '*'.
    return groups


def parse_robots_txt(body: str | bytes | None) -> Optional[List[dict]]:
    """Parse one robots.txt body → list of rule dicts
    (user_agent, rule_path, allow, crawl_delay, rule_seq) in file order.

    Returns ``[]`` for an empty body (allowAll without parsing) and
    ``None`` for a PARSE ERROR (Go: FromBytes error → agent nil →
    allow-all with default delay)."""
    if body is None:
        return []
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    if not body.strip():
        return []
    try:
        groups = _parse_tokens(_tokenize(body))
    except _ParseError:
        return None

    out = []
    for agent, g in groups.items():
        if not g["rules"]:
            # marker row so the group participates in UA selection
            # (default allow); also carries a delay-only group's delay
            out.append(dict(user_agent=agent, rule_path="", allow=True,
                            crawl_delay=g["delay"], rule_seq=1 << 30))
        for seq, path, allow in g["rules"]:
            out.append(dict(user_agent=agent, rule_path=path, allow=allow,
                            crawl_delay=g["delay"], rule_seq=seq))
    return out


ROBOTS_ROWS_SCHEMA = (
    "host string, user_agent string, rule_path string, allow boolean, "
    "crawl_delay double, fetch_status int, rule_seq int"
)


def robots_table_from_text(robots_bodies: DataFrame) -> DataFrame:
    """(host, body, fetch_status) → the engine's robots rules table."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, body, status in zip(
                pdf["host"], pdf["body"], pdf["fetch_status"]
            ):
                parsed = parse_robots_txt(body)
                if not parsed:
                    # empty body OR parse error ⇒ allow-all marker
                    parsed = [dict(user_agent="*", rule_path="",
                                   allow=True, crawl_delay=0.0,
                                   rule_seq=1 << 30)]
                for r in parsed:
                    rows.append(
                        dict(host=host, fetch_status=int(status), **r)
                    )
            yield pd.DataFrame(
                rows,
                columns=["host", "user_agent", "rule_path", "allow",
                         "crawl_delay", "fetch_status", "rule_seq"],
            )

    return robots_bodies.mapInPandas(batches, schema=ROBOTS_ROWS_SCHEMA)
