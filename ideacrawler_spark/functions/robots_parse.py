"""robots.txt TEXT parsing — temoto/robotstxt-go parser semantics.

The engine's politeness join consumes a per-host rules table; this module
produces that table from raw robots.txt bodies, replicating the reference
parser (vendor/.../robotstxt-go/parser.go):

- ``key: value`` lines, ``#`` comments stripped, keys case-insensitive
  (parser.go token scan);
- consecutive ``User-agent`` lines share ONE group (parser.go:75-84:
  "Two successive user-agent lines are part of the same group"); a rule
  line closes the agent run, the next User-agent starts a new group;
- ``Disallow``/``Allow`` with empty path are ignored as rules (empty
  Disallow traditionally means allow-all — no rule is emitted, and the
  engine's default-allow covers it);
- ``Crawl-delay`` parsed as float seconds per group (parser.go:122-129);
- unknown keys (Host, Sitemap, ...) are skipped;
- fetch-status semantics (4xx allow-all / 5xx disallow-all,
  robotstxt.go:63-85) stay the caller's job via the ``fetch_status``
  column.

``robots_table_from_text`` turns a DataFrame of (host, body, fetch_status)
into the engine's (host, user_agent, rule_path, allow, crawl_delay,
fetch_status) rows via one Arrow-batched pass.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame


def parse_robots_txt(body: str | bytes | None) -> List[dict]:
    """Parse one robots.txt body → list of rule dicts:
    (user_agent, rule_path, allow, crawl_delay)."""
    if body is None:
        return []
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    groups: List[dict] = []     # each: {agents: [...], rules: [...], delay: float}
    agents: List[str] = []
    open_agents = False         # inside a run of consecutive UA lines
    current: dict | None = None

    def ensure_group():
        nonlocal current
        if current is None:
            current = {"agents": list(agents), "rules": [], "delay": 0.0}
            groups.append(current)

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not open_agents:   # a rule line closed the previous run
                agents = []
                current = None
                open_agents = True
            agents.append(val)
        elif key in ("disallow", "allow"):
            open_agents = False
            if not agents:
                continue          # rule before any User-agent: ignored
            ensure_group()
            if val:               # empty path ⇒ no rule (allow-all default)
                current["rules"].append((val, key == "allow"))
        elif key == "crawl-delay":
            open_agents = False
            if not agents:
                continue
            ensure_group()
            try:
                current["delay"] = float(val)
            except ValueError:
                pass
        else:
            open_agents = False   # any other directive closes the UA run

    out = []
    for g in groups:
        for agent in g["agents"]:
            if not g["rules"] and not g["delay"]:
                # group with no rules: still emit a marker row so the
                # group participates in UA selection (default allow)
                out.append(dict(user_agent=agent, rule_path="",
                                allow=True, crawl_delay=g["delay"]))
            for path, allow in g["rules"]:
                out.append(dict(user_agent=agent, rule_path=path,
                                allow=allow, crawl_delay=g["delay"]))
    return out


ROBOTS_ROWS_SCHEMA = (
    "host string, user_agent string, rule_path string, allow boolean, "
    "crawl_delay double, fetch_status int"
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
                    # unparseable/empty ⇒ allow-all marker ('*' group)
                    parsed = [dict(user_agent="*", rule_path="",
                                   allow=True, crawl_delay=0.0)]
                for r in parsed:
                    rows.append(
                        dict(host=host, fetch_status=int(status), **r)
                    )
            yield pd.DataFrame(
                rows,
                columns=["host", "user_agent", "rule_path", "allow",
                         "crawl_delay", "fetch_status"],
            )

    return robots_bodies.mapInPandas(batches, schema=ROBOTS_ROWS_SCHEMA)
