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
    # consecutive UA lines share one group (parser.go:75-84)
    fb = [r for r in rows if r["user_agent"] == "fetchbot"]
    ob = [r for r in rows if r["user_agent"] == "otherbot"]
    assert [(r["rule_path"], r["allow"]) for r in fb] == [("/tmp*", False)]
    assert [(r["rule_path"], r["allow"]) for r in ob] == [("/tmp*", False)]
    # empty Disallow ⇒ no rule, but the group exists (marker row)
    eb = [r for r in rows if r["user_agent"] == "emptybot"]
    assert len(eb) == 1 and eb[0]["rule_path"] == "" and eb[0]["allow"]


def test_parse_edge_cases():
    assert parse_robots_txt(None) == []
    assert parse_robots_txt("") == []
    assert parse_robots_txt("Disallow: /x") == []  # rule before UA: ignored
    assert parse_robots_txt(b"User-agent: *\nDisallow: /a") == [
        dict(user_agent="*", rule_path="/a", allow=False, crawl_delay=0.0)
    ]


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
