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
    # (injection consumes eng.pushes; pushes_log keeps effective rounds)
    injected = [dict(p) for p in eng.pushes_log]
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


def test_stateful_host_rate_limiter(spark, tmp_path):
    """applyInPandasWithState: per-host token-bucket state persists across
    micro-batches — a host throttled in batch 1 continues exactly where
    it left off in batch 2 (gap-free admit_seq)."""
    import json as _json

    from ideacrawler_spark.streaming.stateful import rate_limited_stream

    src = tmp_path / "frontier"
    src.mkdir()

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    # batch 1: hosta floods 8 urls (budget 3/batch), hostb sends 2
    write_batch("b1.json", [
        dict(host="hosta", url=f"http://hosta/p/{i}", depth=0, seq=i)
        for i in range(8)
    ] + [
        dict(host="hostb", url=f"http://hostb/p/{i}", depth=0, seq=i)
        for i in range(2)
    ])
    # batch 2: hosta sends 1 more (still rationed), hostb idle
    write_batch("b2.json", [
        dict(host="hosta", url="http://hosta/p/99", depth=0, seq=99),
    ])

    stream = (
        spark.readStream.schema(
            "host string, url string, depth int, seq long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        rate_limited_stream(stream, budget_per_batch=3, max_tokens=6)
        .writeStream.format("memory").queryName("admitted")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table("admitted").collect()
    a = sorted((r["admit_seq"], r["url"]) for r in rows if r["host"] == "hosta")
    b = sorted((r["admit_seq"], r["url"]) for r in rows if r["host"] == "hostb")
    # hosta: batch1 admits 3 (seq 0-2), batch2 grants 3 more tokens and
    # admits the ONE remaining new row — admit_seq continues at 3
    assert [u for _, u in a[:3]] == [f"http://hosta/p/{i}" for i in range(3)]
    assert a[3] == (3, "http://hosta/p/99")
    assert len(a) == 4
    # hostb: both rows admitted in batch 1
    assert [u for _, u in b] == ["http://hostb/p/0", "http://hostb/p/1"]
    assert [s for s, _ in b] == [0, 1]
