"""Sequential reference simulator — the golden generator.

A pure-Python, single-threaded executable specification of the reference's
crawl semantics (shsms/ideacrawler), used to produce golden outputs that
the Spark engine must reproduce bit-for-bit. Every rule cites the Go source
it models:

- seed pre-inserted into the seen-set AS GIVEN (unnormalized) and enqueued
  at depth 0 (job.go:774-788);
- pushed pages bypass normalization AND the seen-set (job.go:692-720,
  comment at :696);
- per-link pipeline in document order: resolve href against the request URL
  (job.go:821) → purell normalize (job.go:826-832) → per-page urlMap →
  eligibility (job.go:792-806) → seen-check; cross-domain links are marked
  seen but NOT enqueued (job.go:842-845) — the child host is LOWERCASE
  (purell mutated u.Host before u.Hostname() is read) while the seed side
  keeps the seed URL's raw case (worker.go:100-112); enqueued children get
  depth+1 and inherit metaStr (job.go:846-869);
- follow gate on the CURRENT page URL (job.go:188): ¬noFollow ∧
  (follow_re ∅ ∨ match(page_url)) ∧ (depth<0 ∨ page_depth<depth);
- error gate: 400≤status<600 ⇒ no links; ship error only at depth 0
  (job.go:121-137);
- mimetype mux: only content-type == spec.mimetype (parameters stripped)
  is handled at all (job.go:620-623, fetchbot handler.go:141-188);
- callback OR-chain (job.go:210-273): callbackSeedUrl∧depth0; no
  cb-url-regexp and no xpath specs; cb-url-regexp matches cmd URL;
  anchor-regexp matches anchor (xpath specs are a non-goal here);
- politeness: per-host FIFO with crawl delay (fetch.go:356-454), robots
  longest-match (robotstxt.go:185-231), MaxConcurrentRequests semaphore
  (doer.go:36-41) — modeled as the deterministic per-round budgets of
  JobSpec.host_budget/global_budget.

The crawl order golden is the deterministic linearization
(round asc, depth asc, discovery_seq asc) of the reference's
BFS-by-depth / per-host-FIFO order — the reference itself interleaves
hosts nondeterministically, so the linearization is the contract.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional
from urllib.parse import urljoin, urlsplit

from ideacrawler_spark.config import DelaySampler, JobSpec
from ideacrawler_spark.functions.extract import extract_links
from ideacrawler_spark.functions.robots import (
    allowed,
    compile_rules,
    decoded_path,
    select_group,
)
from ideacrawler_spark.functions.urlnorm import (  # noqa: F401
    canonicalize,
    go_rejects_ref,
    host_raw,
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _feed_links_et(xml: bytes) -> List[tuple]:
    """INDEPENDENT feed-entry link extraction for the simulator golden:
    xml.etree (a real XML parser) vs the engine's bounded regex scan —
    the two must agree on the fixtures for the crawl golden to pass.
    Mirrors the follow_feeds spec: RSS <item><link> (permalink-style
    <guid> fallback), Atom first <link> with rel absent-or-alternate;
    anchor = title."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    rt = _local(root.tag)
    out: List[tuple] = []
    if rt == "rss":
        for item in root.iter():
            if _local(item.tag) != "item":
                continue
            link = title = guid = None
            for ch in item:
                n = _local(ch.tag)
                if n == "link":
                    link = (ch.text or "").strip()
                elif n == "title":
                    title = (ch.text or "").strip()
                elif n == "guid":
                    guid = (ch.text or "").strip()
            if not link and guid and guid.startswith(("http://", "https://")):
                link = guid
            if link:
                out.append((link, title or ""))
    elif rt == "feed":
        for entry in root.iter():
            if _local(entry.tag) != "entry":
                continue
            link = title = None
            for ch in entry:
                n = _local(ch.tag)
                if n == "title":
                    title = (ch.text or "").strip()
                elif n == "link" and link is None:
                    if (ch.get("rel") or "alternate").lower() == "alternate" \
                            and ch.get("href"):
                        link = ch.get("href")
            if link:
                out.append((link, title or ""))
    return out


def _autodiscovery_hrefs_hp(html: bytes) -> List[str]:
    """INDEPENDENT feed autodiscovery for the golden: stdlib HTMLParser
    over <link> tags vs the engine's regex tag scan."""
    from html.parser import HTMLParser

    hrefs: List[str] = []

    class _P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            if tag != "link":
                return
            d = {k.lower(): (v or "") for k, v in attrs}
            if "alternate" not in d.get("rel", "").lower().split():
                return
            if d.get("type", "").lower().strip() not in (
                    "application/rss+xml", "application/atom+xml"):
                return
            if d.get("href"):
                hrefs.append(d["href"])

    try:
        _P().feed(html.decode("utf-8", errors="replace")
                  if isinstance(html, (bytes, bytearray)) else (html or ""))
    except Exception:
        pass
    return hrefs


def base_content_type(ct: Optional[str]) -> str:
    """Content-Type with parameters stripped (fetchbot handler.go:202-207)."""
    return (ct or "").split(";", 1)[0].strip()


@dataclass
class FrontierEntry:
    depth: int
    seq: int
    url: str          # the command URL string (what gets fetched/shipped)
    url_norm: str     # canonical join key against the pages table
    host: str         # lowercase host of url_norm
    anchor: str = ""
    meta: str = ""
    method: str = "GET"
    pushed: bool = False
    no_callback: bool = False


@dataclass
class SimResult:
    order: List[dict] = field(default_factory=list)     # fetch_seq,url,host,depth,round
    seen: List[str] = field(default_factory=list)       # final seen-set (insertion order)
    shipped: List[dict] = field(default_factory=list)
    outlinks: Dict[str, List[str]] = field(default_factory=dict)
    metrics: List[dict] = field(default_factory=list)   # per (round) lineage
    rounds: int = 0


def _compile(rx: Optional[str]):
    return re.compile(rx) if rx else None


def simulate(
    spec: JobSpec,
    pages: List[dict],
    robots: List[dict],
    pushes: Optional[List[dict]] = None,
) -> SimResult:
    pages_by_url = {p["url"]: p for p in pages}
    # robots: host → ua-group → (rules in FILE ORDER, crawl_delay, status)
    robots_groups: Dict[str, Dict[str, dict]] = {}
    for idx, r in enumerate(robots or []):
        g = robots_groups.setdefault(r["host"], {}).setdefault(
            r["user_agent"], {"rules": [], "crawl_delay": 0.0, "fetch_status": 200}
        )
        g["rules"].append(
            (int(r.get("rule_seq", idx)), r["rule_path"], bool(r["allow"]))
        )
        g["crawl_delay"] = float(r.get("crawl_delay") or 0.0)
        g["fetch_status"] = int(r.get("fetch_status") or 200)
    for groups in robots_groups.values():
        for g in groups.values():
            g["rules"] = [(p, a) for _, p, a in sorted(g["rules"])]

    def robots_group_for(host: str) -> Optional[dict]:
        groups = robots_groups.get(host)
        if not groups:
            return None
        # DomainOpt.Useragent reaches robots matching via fetchbot
        # f.UserAgent (job.go:669, fetch.go:473)
        return select_group(groups, spec.useragent or "Fetchbot")

    compiled_rules: Dict[str, object] = {}

    def robots_allowed(host: str, path: str) -> bool:
        if spec.impolite:
            return True
        if host not in compiled_rules:
            g = robots_group_for(host)
            compiled_rules[host] = (
                compile_rules(g["rules"], g["fetch_status"]) if g else None
            )
        return allowed(compiled_rules[host], decoded_path(path))

    def crawl_delay(host: str) -> float:
        g = robots_group_for(host)
        return float(g["crawl_delay"]) if g and not spec.impolite else 0.0

    # P4: one realized-budget draw per round, same sampler seed as the
    # engine (job_id-derived) so both sides see identical budgets
    delay_sampler = DelaySampler.for_spec(spec)

    follow_re = _compile(spec.follow_url_regexp)
    cb_url_re = _compile(spec.callback_url_regexp)
    cb_anchor_re = _compile(spec.callback_anchor_regexp)

    # -- frontier URL gating (ENGINE EXTENSION, config.py JobSpec knobs;
    # not in the Go reference). Independent re-implementation of the
    # urlfilter.py SQL semantics so engine and simulator cross-check:
    # suffix blocklist on the lowercase host; [0-9]-count of the host;
    # path depth = '/' count of regexp ^[a-z]+://[^/]+(/[^?#]*);
    # param count = '&' count + 1 of the ?([^#]*) capture (0 if empty).
    blockset = set(spec.host_blocklist or ())

    def url_blocked(nurl: str) -> bool:
        if not spec.url_gating:
            return False
        host = (urlsplit(nurl).hostname or "").lower()
        if blockset:
            parts = host.split(".")
            if any(".".join(parts[i:]) in blockset
                   for i in range(len(parts))):
                return True
        if spec.max_host_digits is not None and \
                len(re.findall(r"[0-9]", host)) > spec.max_host_digits:
            return True
        if spec.max_path_depth is not None:
            mm = re.match(r"^[a-z]+://[^/]+(/[^?#]*)", nurl)
            if (mm.group(1).count("/") if mm else 0) > spec.max_path_depth:
                return True
        if spec.max_query_params is not None:
            mq = re.search(r"\?([^#]*)", nurl)
            q = mq.group(1) if mq else ""
            if (0 if q == "" else q.count("&") + 1) > spec.max_query_params:
                return True
        return False

    seen: Dict[str, bool] = {}
    res = SimResult()
    frontier: List[FrontierEntry] = []
    seq_counter = 0
    fetch_seq = 0

    seed_host_raw = host_raw(spec.seed_url) if spec.seed_url else ""
    if spec.seed_url:
        seed_norm = canonicalize(spec.seed_url, unsafe=spec.unsafe_normalize)
        if seed_norm is None:
            # Go url.Parse(SeedUrl) fails ⇒ job never starts (worker.go:112)
            return res
        seen[spec.seed_url] = True  # as given, unnormalized (job.go:776)
        frontier.append(
            FrontierEntry(
                depth=0,
                seq=seq_counter,
                url=spec.seed_url,
                url_norm=seed_norm,
                host=(urlsplit(spec.seed_url).hostname or "").lower(),
            )
        )
        seq_counter += 1

    pushes_by_round: Dict[int, List[dict]] = {}
    for p in pushes or []:
        pushes_by_round.setdefault(int(p.get("round", 0)), []).append(p)

    rnd = 0
    while rnd < spec.max_rounds:
        # -- inject client pushes for this round (no normalization, no dedup)
        for p in sorted(pushes_by_round.get(rnd, []), key=lambda x: x.get("seq", 0)):
            pnorm = canonicalize(p["url"])
            if pnorm is None:
                # bad push URL kills the push goroutine: this push and every
                # later one are dropped (job.go:700-704 returns on error)
                pushes_by_round = {
                    r: v for r, v in pushes_by_round.items() if r < rnd
                }
                break
            frontier.append(
                FrontierEntry(
                    depth=0,
                    seq=seq_counter,
                    url=p["url"],
                    url_norm=pnorm,  # engine-internal join key only
                    host=(urlsplit(p["url"]).hostname or "").lower(),
                    meta=p.get("meta", "") or "",
                    method=p.get("method", "GET") or "GET",
                    pushed=True,
                    no_callback=bool(p.get("no_callback", False)),
                )
            )
            seq_counter += 1
        if not frontier and not any(r > rnd for r in pushes_by_round):
            break
        # -- politeness admission: per-host budget then global budget
        by_host: Dict[str, List[FrontierEntry]] = {}
        for e in sorted(frontier, key=lambda e: (e.depth, e.seq)):
            by_host.setdefault(e.host, []).append(e)
        admitted: List[FrontierEntry] = []
        carried: List[FrontierEntry] = []
        for host, entries in by_host.items():
            hb = spec.host_budget(crawl_delay(host))
            admitted.extend(entries[:hb])
            carried.extend(entries[hb:])
        admitted.sort(key=lambda e: (e.depth, e.seq))
        gb = spec.realized_global_budget(delay_sampler)
        carried.extend(admitted[gb:])
        admitted = admitted[:gb]
        frontier = carried

        logged_out_trip = False
        m = dict(round=rnd, admitted=len(admitted), carried=len(carried),
                 fetched=0, deduped=0, url_blocked=0, robots_denied=0,
                 shipped=0, errors=0,
                 retried=0)  # reference never retries (fetch.go:415-425)

        for e in admitted:
            # robots gate (fetch.go:401,422-425): denied → dropped silently;
            # Go tests the raw (possibly empty) u.Path — no '/' coercion
            path = urlsplit(e.url_norm).path
            if not robots_allowed(e.host, path):
                m["robots_denied"] += 1
                continue
            res.order.append(
                dict(fetch_seq=fetch_seq, url=e.url, host=e.host,
                     depth=e.depth, round=rnd)
            )
            fetch_seq += 1
            m["fetched"] += 1
            page = pages_by_url.get(e.url_norm)
            status = int(page["status"]) if page else 404
            ctype = base_content_type(page["content_type"]) if page else spec.mimetype
            # mimetype mux: non-matching content type → not handled at
            # all — except feed types under follow_feeds (link-following
            # only: no ship / callback / error count / login guard)
            is_feed_page = False
            if ctype != spec.mimetype:
                from ideacrawler_spark.sources.feeds import FEED_MIMETYPES

                if spec.follow_feeds and ctype in FEED_MIMETYPES:
                    is_feed_page = True
                else:
                    continue
            if e.method == "HEAD":
                # HEAD handler re-enqueues as GET with depth RESET TO 0 and
                # anchorText dropped — reference quirk (job.go:302-315,
                # urlDepth/anchorText not propagated)
                frontier.append(
                    FrontierEntry(depth=0, seq=seq_counter, url=e.url,
                                  url_norm=e.url_norm, host=e.host,
                                  anchor="", meta=e.meta, method="GET"))
                seq_counter += 1
                continue
            if e.no_callback:
                continue  # worker.go noCallback: GET handler returns immediately
            if 400 <= status < 600:
                if is_feed_page:
                    continue
                m["errors"] += 1
                if e.depth == 0:
                    res.shipped.append(
                        dict(fetch_seq=fetch_seq - 1, url=e.url, depth=e.depth,
                             anchor_text=e.anchor, meta=e.meta, status=status,
                             text="", success=False, round=rnd))
                    m["shipped"] += 1
                continue
            html = page["html"] if page else b""
            # -- login-session guard (F11 HTTP half, job.go:157-185):
            # case-insensitive first-node equality; mismatch ships an
            # error page with EMPTY url + status 1502 and cancels the job
            # at the round boundary (batch cancelChan analogue)
            if spec.login and spec.check_login_after_each_page \
                    and spec.login_success_check and not is_feed_page:
                from ideacrawler_spark.functions.extract import (
                    xpath_first_value,
                )
                lkey, lval = spec.login_success_check
                if xpath_first_value(html, lkey).lower() != str(lval).lower():
                    res.shipped.append(
                        dict(fetch_seq=fetch_seq - 1, url="", depth=e.depth,
                             anchor_text="", meta="", status=1502,
                             text="", success=False, round=rnd))
                    m["shipped"] += 1
                    m["logged_out"] = m.get("logged_out", 0) + 1
                    logged_out_trip = True
                    continue
            # -- follow gate on the CURRENT page URL (job.go:188)
            if (
                not spec.no_follow
                and (follow_re is None or follow_re.search(e.url))
                and (spec.depth < 0 or e.depth < spec.depth)
            ):
                url_map: Dict[str, bool] = {}
                if is_feed_page:
                    link_iter = _feed_links_et(html)
                else:
                    link_iter = list(extract_links(html))
                    if spec.follow_feeds:
                        link_iter += [(h, "") for h in
                                      _autodiscovery_hrefs_hp(html)]
                for href, anchor in link_iter:
                    # Go requestURL.Parse error ⇒ link skipped (job.go:822-824)
                    if go_rejects_ref(href):
                        continue
                    try:
                        absolute = urljoin(e.url, href)
                    except ValueError:
                        continue
                    nurl = canonicalize(absolute, unsafe=spec.unsafe_normalize)
                    if nurl is None:
                        continue
                    url_map[nurl] = True
                    # eligibility (job.go:792-806)
                    req_match = not (
                        (cb_url_re is not None and not cb_url_re.search(nurl))
                        or (cb_anchor_re is not None and not cb_anchor_re.search(anchor))
                    )
                    follow_match = not (
                        follow_re is not None and not follow_re.search(nurl)
                    )
                    if not req_match and not follow_match:
                        continue
                    # frontier URL gating (engine extension): dropped
                    # BEFORE the seen-set — blocked URLs consume nothing
                    if url_blocked(nurl):
                        m["url_blocked"] += 1
                        continue
                    if nurl in seen:
                        m["deduped"] += 1
                        continue
                    # cross-domain: mark seen, don't enqueue (job.go:842-845).
                    # purell.NormalizeURL mutated u.Host to lowercase BEFORE
                    # u.Hostname() is read at job.go:842, so the CHILD host is
                    # lowercase while the SEED side (j.domainname,
                    # worker.go:100-112) keeps the seed URL's raw case.
                    if spec.seed_url and not spec.follow_other_domains and \
                            (urlsplit(nurl).hostname or "") != seed_host_raw:
                        seen[nurl] = True
                        continue
                    method = "HEAD" if spec.check_content else "GET"
                    frontier.append(
                        FrontierEntry(
                            depth=e.depth + 1, seq=seq_counter, url=nurl,
                            url_norm=nurl,
                            host=(urlsplit(nurl).hostname or "").lower(),
                            anchor=anchor, meta=e.meta, method=method))
                    seen[nurl] = True
                    seq_counter += 1
                res.outlinks[e.url] = sorted(url_map)
            if is_feed_page:
                continue  # feed pages never ship / run callbacks
            # -- callback OR-chain (job.go:210-273)
            cb = False
            if spec.callback_seed_url and e.depth == 0:
                cb = True
            if not spec.callback_url_regexp and not spec.callback_xpath_match \
                    and not spec.callback_xpath_regexp:
                cb = True  # no callback specs at all ⇒ ship (job.go:217-219)
            if cb_url_re is not None and cb_url_re.search(e.url):
                cb = True
            if cb_anchor_re is not None and cb_anchor_re.search(e.anchor):
                cb = True
            # xpath blocks — BOTH compare by equality (job.go:233-269 quirk)
            from ideacrawler_spark.functions.extract import xpath_all_equal
            if not cb and spec.callback_xpath_match:
                cb = xpath_all_equal(html, spec.callback_xpath_match)
            if not cb and spec.callback_xpath_regexp:
                cb = xpath_all_equal(html, spec.callback_xpath_regexp)
            if cb:
                res.shipped.append(
                    dict(fetch_seq=fetch_seq - 1, url=e.url, depth=e.depth,
                         anchor_text=e.anchor, meta=e.meta, status=status,
                         text=page["text"] if page else "",
                         success=True, round=rnd))
                m["shipped"] += 1
        res.metrics.append(m)
        rnd += 1
        if logged_out_trip:
            break  # cancelChan: the job stops after this round commits
        if not frontier and not any(r >= rnd for r in pushes_by_round):
            break

    res.seen = list(seen)
    res.rounds = rnd
    return res
