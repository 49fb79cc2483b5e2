"""Reference-quirk e2e tests: HEAD/check_content depth reset (F9),
mimetype filter (F8)."""

from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.plans.crawl import CrawlEngine
from ideacrawler_spark.refsim import simulate


def _run_both(spark, web, web_dfs, spec, pushes=None):
    pages, robots, _, _ = web
    pages_df, robots_df, _, _ = web_dfs
    golden = simulate(spec, pages, robots, pushes)
    eng = CrawlEngine(spark, spec, pages_df, robots_df, pushes,
                      shuffle_partitions=8)
    return golden, eng.run()


def _assert_order_seen(golden, got):
    order = [(r["fetch_seq"], r["url"], r["depth"], r["round"])
             for r in got["order"].orderBy("fetch_seq").collect()] \
        if got["order"] is not None else []
    want = [(o["fetch_seq"], o["url"], o["depth"], o["round"])
            for o in golden.order]
    assert order == want
    assert {r["key"] for r in got["seen"].collect()} == set(golden.seen)


def test_check_content_head(spark, web, web_dfs):
    """CheckContent ⇒ links enqueued as HEAD; HEAD handler re-enqueues GET
    with depth RESET to 0 and anchor dropped (job.go:302-315 quirk)."""
    spec = JobSpec(job_id="head", seed_url="http://hostc.example/p/0",
                   check_content=True, depth=2, min_delay_s=1,
                   round_seconds=10, max_rounds=10)
    golden, got = _run_both(spark, web, web_dfs, spec)
    assert any(o["depth"] == 0 and o["url"] != spec.seed_url
               for o in golden.order), "quirk not exercised by fixture"
    _assert_order_seen(golden, got)


def test_mimetype_filter(spark, web, web_dfs):
    """Non-matching content types are not handled at all (job.go:620-623):
    crawling with mimetype=application/pdf ships only pdf pages."""
    spec = JobSpec(job_id="mime", seed_url="http://hosta.example/p/0",
                   mimetype="application/pdf", min_delay_s=1,
                   round_seconds=10, max_rounds=4)
    golden, got = _run_both(spark, web, web_dfs, spec)
    _assert_order_seen(golden, got)
    shipped = got["shipped"].collect() if got["shipped"] is not None else []
    assert len(shipped) == len(golden.shipped)


def test_xpath_callback_equality_quirk(spark, web, web_dfs):
    """CallbackXpathRegexp compares by EQUALITY despite the name
    (job.go:252-269); fixture pages carry their url in <title>."""
    target = "http://hosta.example/p/3"
    spec = JobSpec(job_id="xp", seed_url="http://hosta.example/p/0",
                   callback_xpath_regexp=(("//title", target),),
                   min_delay_s=1, round_seconds=10, max_rounds=6)
    golden, got = _run_both(spark, web, web_dfs, spec)
    want = sorted((s["url"], s["depth"]) for s in golden.shipped)
    shipped = sorted((r["url"], r["depth"]) for r in got["shipped"].collect()) \
        if got["shipped"] is not None else []
    assert shipped == want
    assert all(u == target for u, _ in shipped) and len(shipped) >= 1
    _assert_order_seen(golden, got)


def test_no_callback_push(spark, web, web_dfs):
    """noCallback commands are fetched but never shipped and never followed
    (fetchHTTPGetHandler early return, job.go:118-120)."""
    pushes = [
        dict(round=0, url="http://hosta.example/p/5", method="GET",
             meta="nc", seq=0, no_callback=True),
    ]
    spec = JobSpec(job_id="nc", seed_url="", impolite=True, depth=2,
                   min_delay_s=1, round_seconds=10)
    golden, got = _run_both(spark, web, web_dfs, spec, pushes=pushes)
    _assert_order_seen(golden, got)
    n_ship = got["shipped"].count() if got["shipped"] is not None else 0
    assert n_ship == len(golden.shipped) == 0
    assert len(golden.order) == 1  # fetched exactly once, nothing followed


def test_no_robots_table(spark, web, web_dfs):
    """Engine path with robots=None (host dim absent entirely)."""
    from ideacrawler_spark.plans.crawl import CrawlEngine
    from ideacrawler_spark.refsim import simulate

    pages, _, _, _ = web
    pages_df, _, _, _ = web_dfs
    spec = JobSpec(job_id="nr", seed_url="http://hostc.example/p/0",
                   impolite=True, min_delay_s=1, round_seconds=10,
                   max_rounds=4)
    golden = simulate(spec, pages, robots=[], pushes=None)
    got = CrawlEngine(spark, spec, pages_df, robots=None,
                      shuffle_partitions=8).run()
    _assert_order_seen(golden, got)


def test_xpath_attribute_callback(spark, web, web_dfs):
    """Attribute-predicate xpath callback (//a[@class='l']): ships only
    pages whose FIRST matching anchor's untrimmed string value equals the
    target — the widened subset driving the real callback gate (F7)."""
    from ideacrawler_spark.functions.extract import xpath_first_value

    pages, _, _, _ = web
    by_url = {p["url"]: p["html"] for p in pages}
    target = xpath_first_value(by_url["http://hosta.example/p/2"],
                               "//a[@class='l']")
    assert target.startswith("  ")  # antchfx keeps the fixture's padding
    spec = JobSpec(job_id="xpattr", seed_url="http://hosta.example/p/0",
                   callback_xpath_match=(("//a[@class='l']", target),),
                   min_delay_s=1, round_seconds=10, max_rounds=6)
    golden, got = _run_both(spark, web, web_dfs, spec)
    _assert_order_seen(golden, got)
    shipped = sorted(r["url"] for r in got["shipped"].collect()) \
        if got["shipped"] is not None else []
    assert shipped == sorted(s["url"] for s in golden.shipped)
    assert "http://hosta.example/p/2" in shipped


def test_xpath_numeric_predicate_callback(spark, web, web_dfs):
    """Numeric-predicate xpath callback (//a[@data-i>2], VERDICT r04 #4):
    the fixture anchors carry a numeric data-i ordinal; the spec ships
    only pages whose first anchor with data-i > 2 (i.e. the 4th anchor)
    has the target string value — number() comparison driving the real
    callback gate end-to-end through engine AND simulator."""
    from ideacrawler_spark.functions.extract import xpath_first_value

    pages, _, _, _ = web
    by_url = {p["url"]: p["html"] for p in pages}
    expr = "//a[@data-i>2]"
    target = xpath_first_value(by_url["http://hosta.example/p/2"], expr)
    assert target != ""  # p/2 has at least 4 anchors in this fixture
    spec = JobSpec(job_id="xpnum", seed_url="http://hosta.example/p/0",
                   callback_xpath_match=((expr, target),),
                   min_delay_s=1, round_seconds=10, max_rounds=6)
    golden, got = _run_both(spark, web, web_dfs, spec)
    _assert_order_seen(golden, got)
    shipped = sorted(r["url"] for r in got["shipped"].collect()) \
        if got["shipped"] is not None else []
    assert shipped == sorted(s["url"] for s in golden.shipped)
    assert "http://hosta.example/p/2" in shipped
    # the gate is selective: not every fetched page shipped
    assert len(shipped) < len(golden.order)


def test_useragent_robots_group(spark, web, web_dfs):
    """DomainOpt.Useragent reaches robots GROUP SELECTION (job.go:669 →
    FindGroup(f.UserAgent), fetch.go:473): the same crawl against a
    robots file carrying a named 'SparkBot' group must pick that group
    (blocking /p/ paths) when the spec UA starts with it, and fall back
    to '*' under the default Fetchbot UA — engine ≡ simulator on both."""
    pages, _, _, _ = web
    pages_df, _, _, _ = web_dfs
    robots = [
        dict(host="hosta.example", user_agent="*", rule_path="",
             allow=True, crawl_delay=0.0, fetch_status=200, rule_seq=0),
        dict(host="hosta.example", user_agent="SparkBot", rule_path="/p/",
             allow=False, crawl_delay=0.0, fetch_status=200, rule_seq=1),
    ]
    from ideacrawler_spark.sources.fixtures import ROBOTS_SCHEMA

    robots_df = spark.createDataFrame(robots, ROBOTS_SCHEMA)
    base = dict(seed_url="http://hosta.example/p/0", min_delay_s=1,
                round_seconds=10, max_rounds=4)
    # named-group UA: every /p/ URL on hosta is robots-denied
    spec_bot = JobSpec(job_id="uabot", useragent="SparkBot/1.0", **base)
    golden_bot = simulate(spec_bot, pages, robots)
    got_bot = CrawlEngine(spark, spec_bot, pages_df, robots_df,
                          shuffle_partitions=8).run()
    _assert_order_seen(golden_bot, got_bot)
    assert len(golden_bot.order) == 0  # seed itself is denied
    # default UA picks '*' (allow-all): the crawl proceeds
    spec_def = JobSpec(job_id="uadef", **base)
    golden_def = simulate(spec_def, pages, robots)
    got_def = CrawlEngine(spark, spec_def, pages_df, robots_df,
                          shuffle_partitions=8).run()
    _assert_order_seen(golden_def, got_def)
    assert len(golden_def.order) > 0


def test_login_session_guard(spark, web, web_dfs):
    """F11 (HTTP half): CheckLoginAfterEachPage + LoginSuccessCheck — the
    guard passes while the check xpath's first-node value matches
    CASE-INSENSITIVELY; a mismatching page ships a status-1502 error row
    with an EMPTY url, contributes no links, and cancels the job at the
    round boundary (job.go:157-185, statuscodes.go:8)."""
    spec = JobSpec(job_id="login", seed_url="http://hosta.example/p/0",
                   login=True, check_login_after_each_page=True,
                   login_success_check=("//title",
                                        "HTTP://HOSTA.EXAMPLE/P/0"),
                   min_delay_s=1, round_seconds=10, max_rounds=8)
    golden, got = _run_both(spark, web, web_dfs, spec)
    _assert_order_seen(golden, got)
    shipped = sorted((r["url"], r["status"], r["success"])
                     for r in got["shipped"].collect())
    want = sorted((s["url"], s["status"], s["success"])
                  for s in golden.shipped)
    assert shipped == want
    # round 0 passed the case-insensitive check and shipped normally
    assert ("http://hosta.example/p/0", 200, True) in shipped
    # round 1 pages carry different titles: 1502 rows with EMPTY url
    trips = [s for s in shipped if s[1] == 1502]
    assert trips and all(u == "" and not ok for u, _, ok in trips)
    # cancelChan analogue: the job stopped right after the tripping round
    assert got["rounds"] == golden.rounds == 2
