"""robots.txt text parsing (parser.go semantics) + engine integration."""

from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.functions.robots_parse import (
    parse_robots_txt,
    robots_table_from_text,
)
from ideacrawler_spark.plans.crawl import CrawlEngine
from ideacrawler_spark.refsim import simulate

SAMPLE = """
# comment line
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2.5

User-agent: fetchbot
User-agent: otherbot
Disallow: /tmp*
Sitemap: http://x.example/sitemap.xml

User-agent: emptybot
Disallow:
"""


def test_parse_groups_and_rules():
    rows = parse_robots_txt(SAMPLE)
    star = [r for r in rows if r["user_agent"] == "*"]
    assert {(r["rule_path"], r["allow"]) for r in star} == {
        ("/private", False), ("/private/ok", True)}
    assert all(r["crawl_delay"] == 2.5 for r in star)
    # consecutive UA lines share one group (parser.go:75-84); the rule
    # value is normalized at parse time: trailing '*' stripped
    # (parser.go:183-192 returnPathVal)
    fb = [r for r in rows if r["user_agent"] == "fetchbot"]
    ob = [r for r in rows if r["user_agent"] == "otherbot"]
    assert [(r["rule_path"], r["allow"]) for r in fb] == [("/tmp", False)]
    assert [(r["rule_path"], r["allow"]) for r in ob] == [("/tmp", False)]
    # Go quirk: 'Disallow:' with an empty value mid-file makes the NEWLINE
    # token the value (parseLine peeks the next token), so emptybot gets a
    # never-matching '/\n' rule — it exists as a group but allows all
    eb = [r for r in rows if r["user_agent"] == "emptybot"]
    assert [(r["rule_path"], r["allow"]) for r in eb] == [("/\n", False)]


def test_parse_edge_cases():
    assert parse_robots_txt(None) == []
    assert parse_robots_txt("") == []
    # a rule before any User-agent is a PARSE ERROR that fails the whole
    # file (parser.go:86-92) → getRobotAgent nil → allow-all (None)
    assert parse_robots_txt("Disallow: /x") is None
    assert parse_robots_txt("User-agent: a\nCrawl-delay: abc") is None
    assert parse_robots_txt(b"User-agent: *\nDisallow: /a") == [
        dict(user_agent="*", rule_path="/a", allow=False, crawl_delay=0.0,
             rule_seq=0)
    ]


def test_parse_go_quirks():
    # leading '/' added when the value starts with neither '*' nor '/'
    rows = parse_robots_txt("User-agent: *\nDisallow: foo")
    assert rows[0]["rule_path"] == "/foo"
    # 'Disallow: *' strips to empty — a rule that can never win
    rows = parse_robots_txt("User-agent: *\nDisallow: *")
    assert rows[0]["rule_path"] == ""
    # Sitemap does NOT close the UA run: a and b share one group in Go
    rows = parse_robots_txt(
        "User-agent: a\nSitemap: http://x/s.xml\nUser-agent: b\nDisallow: /c"
    )
    assert {(r["user_agent"], r["rule_path"]) for r in rows} == {
        ("a", "/c"), ("b", "/c")}
    # agents are lowercased at parse time (parser.go:221-227)
    rows = parse_robots_txt("User-agent: FetchBot\nDisallow: /x")
    assert rows[0]["user_agent"] == "fetchbot"
    # the same agent in two runs MERGES (groups are a map); rules keep
    # file order via rule_seq and the later Crawl-delay overwrites
    rows = parse_robots_txt(
        "User-agent: a\nDisallow: /one\nCrawl-delay: 1\n"
        "User-agent: b\nDisallow: /b\n"
        "User-agent: a\nDisallow: /two\nCrawl-delay: 9\n"
    )
    a = sorted(
        [(r["rule_seq"], r["rule_path"]) for r in rows if r["user_agent"] == "a"]
    )
    assert [p for _, p in a] == ["/one", "/two"]
    assert all(r["crawl_delay"] == 9.0 for r in rows if r["user_agent"] == "a")
    # 'useragent' / 'crawldelay' spellings accepted (parser.go:220,247)
    rows = parse_robots_txt("useragent: x\ncrawldelay: 3\nDisallow: /y")
    assert rows == [
        dict(user_agent="x", rule_path="/y", allow=False, crawl_delay=3.0,
             rule_seq=0)
    ]
    # mid-token '#' is NOT a comment (scanner only skips '#' at token start)
    rows = parse_robots_txt("User-agent: *\nDisallow: /a#b  # real comment")
    assert rows[0]["rule_path"] == "/a#b"


def test_engine_with_text_robots_matches_fixture(spark, web, web_dfs):
    """Crawl driven by robots TEXT must equal the pre-parsed fixture run."""
    pages, robots, _, _ = web
    pages_df, _, _, _ = web_dfs
    # synthesize bodies equivalent to the fixture rows
    bodies = [
        ("hosta.example", "User-agent: *\nDisallow: /tmp*\n", 200),
        ("hostb.example",
         "User-agent: *\nDisallow: /p/1\nAllow: /p/10\nCrawl-delay: 2\n", 200),
        ("hostc.example", "User-agent: *\nDisallow: /\n", 404),  # 404 ⇒ allow
    ]
    bodies_df = spark.createDataFrame(
        bodies, "host string, body string, fetch_status int")
    robots_df = robots_table_from_text(bodies_df)
    spec = JobSpec(job_id="rp", seed_url="http://hostb.example/p/0",
                   min_delay_s=1, round_seconds=10, max_rounds=5)
    golden = simulate(spec, pages, robots, None)
    got = CrawlEngine(spark, spec, pages_df, robots_df,
                      shuffle_partitions=8).run()
    order = [(r["fetch_seq"], r["url"]) for r in
             got["order"].orderBy("fetch_seq").collect()]
    want = [(o["fetch_seq"], o["url"]) for o in golden.order]
    assert order == want
