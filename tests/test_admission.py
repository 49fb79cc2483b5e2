"""admit_topk / admit_budget unit semantics — the bucket-histogram global
cap (P5) and the salted per-host budget (P2), exercised at BINDING limits
(the e2e fixtures rarely saturate them)."""

from pyspark.sql import functions as F

from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.operators.admission import admit_budget, admit_topk
from ideacrawler_spark.plans.crawl import CrawlEngine
from ideacrawler_spark.refsim import simulate


def _frontier(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("http://h/p/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 5).cast("int").alias("depth"),
        F.col("id").alias("seq"),
    )


def test_admit_topk_exact_boundary(spark):
    fr = _frontier(spark)
    for k in (1, 7, 123, 499, 500, 600):
        admitted, rest = admit_topk(fr, k)
        a = admitted.collect()
        assert len(a) == min(k, 500)
        assert rest.count() == 500 - min(k, 500)
        # exactness: the admitted set IS the k smallest by (depth, seq)
        want = sorted(fr.collect(), key=lambda r: (r["depth"], r["seq"]))[:k]
        assert sorted((r["depth"], r["seq"]) for r in a) == \
            sorted((r["depth"], r["seq"]) for r in want)


def test_admit_budget_binding_global(spark):
    fr = _frontier(spark)
    admitted, carried = admit_budget(fr, F.lit(1000), global_budget=10)
    a = admitted.collect()
    assert len(a) == 10
    assert carried.count() == 490
    want = sorted(fr.collect(), key=lambda r: (r["depth"], r["seq"]))[:10]
    assert sorted((r["depth"], r["seq"]) for r in a) == \
        sorted((r["depth"], r["seq"]) for r in want)


def test_binding_global_budget_e2e(spark, web, web_dfs):
    """max_concurrent=1 ⇒ global budget 2/round: heavy carry-over, many
    rounds — the reference's semaphore at its tightest (doer.go:36-41)."""
    pages, robots, _, _ = web
    pages_df, robots_df, _, _ = web_dfs
    spec = JobSpec(job_id="tight", seed_url="http://hosta.example/p/0",
                   min_delay_s=5, round_seconds=10, max_concurrent=1,
                   depth=2, max_rounds=12)
    golden = simulate(spec, pages, robots, None)
    got = CrawlEngine(spark, spec, pages_df, robots_df,
                      shuffle_partitions=8).run()
    order = [(r["fetch_seq"], r["url"], r["round"]) for r in
             got["order"].orderBy("fetch_seq").collect()]
    want = [(o["fetch_seq"], o["url"], o["round"]) for o in golden.order]
    assert order == want
    assert {r["key"] for r in got["seen"].collect()} == set(golden.seen)
    # the cap truly bound: no round fetched more than 2
    per_round = {}
    for _, _, rnd in order:
        per_round[rnd] = per_round.get(rnd, 0) + 1
    assert max(per_round.values()) <= 2 and len(per_round) >= 4


def test_order_key_packing_boundary(spark):
    """(depth, seq) packing is exact up to seq = 2^40 - 1 and FAILS LOUDLY
    at 2^40 (silent wraparound would mis-order the frontier)."""
    import pytest

    from ideacrawler_spark.operators.admission import order_key

    ok = spark.createDataFrame(
        [(0, (1 << 40) - 1), (5, 123)], "depth int, seq long")
    vals = sorted(
        r["k"] for r in
        ok.select(order_key(F.col("depth"), F.col("seq")).alias("k")).collect())
    assert vals == [(1 << 40) - 1, 5 * (1 << 40) + 123]
    bad = spark.createDataFrame([(0, 1 << 40)], "depth int, seq long")
    with pytest.raises(Exception, match="order_key packing overflow"):
        bad.select(order_key(F.col("depth"), F.col("seq")).alias("k")).collect()
    deep = spark.createDataFrame([(1 << 23, 0)], "depth long, seq long")
    with pytest.raises(Exception, match="order_key packing overflow"):
        deep.select(order_key(F.col("depth"), F.col("seq")).alias("k")).collect()


def test_blocklist_suffix_and_url_signals(spark):
    """Suffix blocklist: blocking 'tracker.example' also blocks
    'cdn.tracker.example' but NOT 'nottracker.example' (dot-boundary);
    spam signals are exact integers."""
    from ideacrawler_spark.operators.urlfilter import (
        blocklist_filter, url_signals,
    )

    fr = spark.createDataFrame(
        [
            ("http://tracker.example/p/1", "tracker.example"),
            ("http://cdn.tracker.example/x.js?a=1&b=2", "cdn.tracker.example"),
            ("http://nottracker.example/p/2", "nottracker.example"),
            ("http://h0st123.example/a/b/c/d?x=1", "h0st123.example"),
        ],
        "url string, host string",
    )
    out = {r["host"]: r for r in
           url_signals(blocklist_filter(fr, ["tracker.example"])).collect()}
    assert out["tracker.example"]["blocked"] is True
    assert out["cdn.tracker.example"]["blocked"] is True
    assert out["nottracker.example"]["blocked"] is False
    r = out["h0st123.example"]
    assert (r["n_host_digits"], r["path_depth"], r["n_params"]) == (4, 4, 1)
    assert out["cdn.tracker.example"]["n_params"] == 2
    assert out["tracker.example"]["n_params"] == 0


def test_global_rank_small_hint_equivalence(spark):
    """The single-exchange small path (a proven row-count bound skips the
    range-sampling job + shuffle) produces the SAME ranks and the SAME
    long dtype as the scalable path; a bound above the threshold keeps
    the scalable path."""
    from ideacrawler_spark.operators.rank import SMALL_RANK_ROWS, global_rank

    df = spark.range(3000).select(
        (F.col("id") % 7).cast("int").alias("depth"),
        (F.col("id") * 37 % 3000).alias("seq"),
    )
    big = global_rank(df, ["depth", "seq"], out_col="r", offset=5,
                      num_partitions=8).orderBy("depth", "seq")
    small = global_rank(df, ["depth", "seq"], out_col="r", offset=5,
                        num_partitions=8, small_hint=3000
                        ).orderBy("depth", "seq")
    assert dict(small.dtypes)["r"] == "bigint"
    assert [r["r"] for r in big.collect()] == \
        [r["r"] for r in small.collect()] == list(range(5, 3005))
    # a hint above the threshold must NOT collapse to one partition
    over = global_rank(df, ["depth", "seq"], out_col="r",
                       num_partitions=8, small_hint=SMALL_RANK_ROWS + 1)
    plan = over._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
