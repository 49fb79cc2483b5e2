"""Structured-Streaming push source (S2 as a stream, SURVEY §2.7):
micro-batched pushes must produce the same crawl as the batch engine
given the same injection rounds."""

import json
import os

from ideacrawler_spark.config import JobSpec
from ideacrawler_spark.plans.crawl import CrawlEngine
from ideacrawler_spark.streaming.microbatch import StreamingCrawl


def test_streaming_pushes_match_batch(spark, web, web_dfs, tmp_path):
    pages_df, robots_df, _, _ = web_dfs
    spec = JobSpec(job_id="stream", seed_url="", impolite=True, depth=1,
                   follow_url_regexp=r"example", callback_url_regexp=r"p/[0-4]$",
                   min_delay_s=1, round_seconds=10)
    push_dir = tmp_path / "pushes"
    push_dir.mkdir()
    batch1 = [dict(url="http://hosta.example/p/0", method="GET", meta="s1",
                   seq=0, no_callback=False)]
    batch2 = [dict(url="http://hostb.example/p/0", method="GET", meta="s2",
                   seq=1, no_callback=False)]
    for i, b in enumerate([batch1, batch2]):
        with open(push_dir / f"batch{i}.json", "w") as f:
            for row in b:
                f.write(json.dumps(row) + "\n")

    eng = CrawlEngine(spark, spec, pages_df, robots_df, pushes=[],
                      shuffle_partitions=8)
    sc = StreamingCrawl(eng, str(push_dir), checkpoint_dir=str(tmp_path / "sck"))
    out = sc.run_available()
    assert sc.batches == 2

    # replay as a batch job with pushes at the rounds the stream recorded
    injected = [dict(p) for p in eng.pushes]
    eng2 = CrawlEngine(spark, spec, pages_df, robots_df, pushes=injected,
                       shuffle_partitions=8)
    out2 = eng2.run()

    def state(o):
        order = [(r["fetch_seq"], r["url"], r["depth"]) for r in
                 o["order"].orderBy("fetch_seq").collect()]
        shipped = sorted((r["url"], r["meta"], r["text"]) for r in
                         o["shipped"].collect())
        seen = sorted(r["key"] for r in o["seen"].collect())
        return order, shipped, seen

    assert state(out) == state(out2)
    assert len(state(out)[0]) > 2  # the stream actually crawled


def test_windowed_event_counts_stream(spark, tmp_path):
    """Watermark + tumbling window over a parquet event stream matches the
    batch aggregation (SURVEY §2.7)."""
    import shutil

    from pyspark.sql import functions as F

    from ideacrawler_spark.streaming.windows import run_available_to_memory

    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                events_dir / "events.parquet")
    got = run_available_to_memory(spark, str(events_dir), name="wtest")
    batch = (
        spark.read.parquet(str(events_dir))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 10


def test_subscribe_streams_each_round(spark, web, web_dfs):
    """AddDomainAndListen analogue: the per-round subscription yields the
    same shipped set as a plain run(), in round order; abandoning the
    generator stops the crawl like a subscriber disconnect."""
    from ideacrawler_spark.config import JobSpec
    from ideacrawler_spark.plans.crawl import CrawlEngine

    pages_df, robots_df, _, _ = web_dfs
    spec = JobSpec(job_id="sub", seed_url="http://hosta.example/p/0",
                   min_delay_s=1, round_seconds=10, max_concurrent=5,
                   depth=3, max_rounds=8)
    ref = CrawlEngine(spark, spec, pages_df, robots_df,
                      shuffle_partitions=8).run()
    want = sorted((r["fetch_seq"], r["url"], r["text"])
                  for r in ref["shipped"].collect())

    eng = CrawlEngine(spark, spec, pages_df, robots_df, shuffle_partitions=8)
    got, rounds = [], []
    for ev in eng.subscribe():
        rounds.append(ev["round"])
        got.extend((r["fetch_seq"], r["url"], r["text"])
                   for r in ev["shipped"].collect())
        assert ev["outlinks"] is not None
        assert ev["metrics"]["round"] == ev["round"]
    assert rounds == sorted(rounds)
    assert sorted(got) == want

    # disconnect mid-crawl: no further rounds run
    eng2 = CrawlEngine(spark, spec, pages_df, robots_df, shuffle_partitions=8)
    it = eng2.subscribe()
    next(it)
    it.close()  # subscriber goes away
    r_at_close = eng2.round
    assert eng2.round == r_at_close  # nothing advances afterwards
    assert eng2.round < ref["rounds"]
