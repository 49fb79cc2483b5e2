"""Physical-plan shape assertions — the scale claims in PLANS.md pinned
as tests, so a regression that silently de-optimizes a plan (a lost
WindowGroupLimit, a broadcast that becomes a shuffle join, a filter that
stops reaching the scan) fails CI instead of a future benchmark."""

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_admission_uses_window_group_limit(spark):
    """host_budget_max literal ⇒ Catalyst inserts WindowGroupLimit (the
    partial per-task top-k that replaced full window sorts — PLANS.md
    §7e, the round-2 headline win)."""
    from ideacrawler_spark.operators.admission import admit_budget

    fr = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("http://h/p/"), F.col("id")).alias("url"),
        (F.col("id") % 5).cast("int").alias("depth"),
        F.col("id").alias("seq"),
    )
    admitted, _ = admit_budget(fr, F.lit(25), host_budget_max=25)
    assert "WindowGroupLimit" in _plan(admitted)


def test_documents_filter_and_pruning_reach_scan(spark):
    """Simple predicates push into the parquet scan (PushedFilters) and
    projection prunes the read schema to the selected columns."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_robots_dim_joins_broadcast(spark, web_dfs):
    """The per-host robots dim joins the frontier via BroadcastHashJoin —
    never a shuffle join (plans/round.py broadcasts it explicitly)."""
    from ideacrawler_spark.config import JobSpec
    from ideacrawler_spark.plans.crawl import CrawlEngine

    pages_df, robots_df, _, _ = web_dfs
    eng = CrawlEngine(spark, JobSpec(job_id="p", seed_url="http://hosta.example/p/0",
                                     min_delay_s=1, round_seconds=10),
                      pages_df, robots_df, shuffle_partitions=8)
    fr = spark.createDataFrame(
        [(0, 0, "http://hosta.example/p/0", "http://hosta.example/p/0",
          "hosta.example", "", "", "GET", False, False)],
        "depth int, seq long, url string, url_norm string, host string, "
        "anchor string, meta string, method string, pushed boolean, "
        "no_callback boolean",
    )
    joined = fr.join(
        F.broadcast(eng.robots_host), on="host", how="left")
    assert "BroadcastHashJoin" in _plan(joined)


def test_stratified_sample_has_no_exchange(spark):
    """The hash-sample is a pure map-side filter: zero Exchange nodes in
    the plan (a 100 TB mix costs one pass, PLANS.md §8f)."""
    from ideacrawler_spark.textops.sampling import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = stratified_sample(docs, {"en": (1, 2)}, default_rate=(1, 8))
    plan = _plan(q)
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_banded_near_dup_shuffles_on_band_bucket(spark):
    """The capped ANN self-join's shuffle key is (band, bucket) — the
    equi-join keys — with the dot-q threshold INSIDE the join, not a
    post-filter over a wider join (PLANS.md §7c-d)."""
    from ideacrawler_spark.textops.similarity import near_dup_pairs_banded

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = near_dup_pairs_banded(emb, threshold_dot_q=10_000_000,
                              n_bands=2, planes_per_band=6, bucket_cap=64)
    plan = _plan(q)
    # an EQUI-join on the (band, bucket) keys: hash-keyed (sort-merge /
    # shuffled-hash at scale; broadcast-hash at this tiny SF), never a
    # nested-loop or cartesian over all pairs
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the exact dot-product threshold sits INSIDE the join condition,
    # not as a post-filter over a wider join output
    assert "Join condition" in plan and "10000000" in plan


def test_blocklist_broadcasts_only_the_dim(spark):
    """blocklist_filter (VERDICT r03 #5): the only broadcast HINT is on
    the input blocklist dim; the frontier-derived blocked-host set joins
    back by host key with no forced broadcast (Catalyst/AQE may still
    choose one at runtime from actual stats — that is the point)."""
    from ideacrawler_spark.operators.urlfilter import blocklist_filter

    fr = spark.range(2000).select(
        F.concat(F.lit("h"), (F.col("id") % 37).cast("string"),
                 F.lit(".example")).alias("host"),
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
    )
    out = blocklist_filter(fr, ["h3.example", "h7.example"])
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1
    rows = out.collect()
    blocked = {r["host"] for r in rows if r["blocked"]}
    assert blocked == {"h3.example", "h7.example"}
    # residues 3 and 7 each occur floor(2000/37)=54 times in 0..1999
    assert sum(r["blocked"] for r in rows) == 54 * 2


def test_pack_sequences_no_global_window_over_data(spark):
    """The global token prefix sum must be the two-phase shape: the
    data-side running sum windows on the range-partition id, and the only
    empty-partition-spec window (a single-partition sort) runs over the
    per-partition TOTALS — bounded by num_range_parts rows. A naive
    rewrite through `Window.orderBy(doc_id)` on the data would put an
    unpartitioned windowspecdefinition over the full docs relation and
    sink 100 TB through one task."""
    from ideacrawler_spark.textops.packing import pack_sequences

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), 7)).alias("text"),
    )
    import re

    plan = _plan(pack_sequences(docs, ctx_len=64, num_range_parts=8))
    # exactly two Window operators in the whole plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan
    # the data-side cumsum PARTITIONS by pid (partition spec [pid#N]
    # follows the windowspecdefinition in the operator arguments)
    assert re.search(
        r"windowspecdefinition\(pid#\d+, doc_id#\d+L ASC[^\n]*"
        r"\], \[pid#\d+\]", plan), plan
    # the offsets side (the only unpartitioned window) feeds a broadcast
    assert "BroadcastExchange" in plan


def test_semdedup_broadcasts_centroids_and_reps_join_on_cell(spark):
    """SemDeDup's plan shape: centroid assignment is a broadcast
    (nested-loop) join — never a shuffled cross join — and the dedup
    pair join is a hash join keyed on cell (the bounded-pair scale
    path)."""
    from ideacrawler_spark.textops.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(semdedup(emb))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the rep-vs-member pair join carries the cell key through a hash join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or plan.count("BroadcastHashJoin") >= 1


def test_dsir_weight_dim_joins_broadcast(spark):
    """DSIR's 4096-row bucket-weight table must reach the token stream
    via BroadcastHashJoin (a shuffle join over the exploded words would
    re-shuffle the corpus-sized side)."""
    from ideacrawler_spark.textops.dsir import dsir_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dsir_select(docs))
    assert "BroadcastHashJoin" in plan


def test_surt_transform_is_jvm_side(spark):
    """The SURT key derivation is a single JVM-side Project over the
    scan — no Python evaluation nodes (BatchEvalPython/ArrowEvalPython/
    MapInPandas) and no shuffle. (The array_sort/reverse lambdas keep
    the Project out of WholeStageCodegen, but it is still columnar JVM
    expression evaluation, not a Python boundary.)"""
    from ideacrawler_spark.sources.cdx import surt_col

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.select(surt_col(
        F.concat(F.lit("http://h"), F.col("doc_id").cast("string"),
                 F.lit(".example.org/p"))).alias("surt"))
    plan = _plan(q)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "Exchange"):
        assert bad not in plan
    assert "Scan parquet" in plan
