"""Dump .explain('formatted') for the round-6 optimization targets.

Usage: python scripts_r06/dump_plans.py before|after [query ...]
Writes plans/r06/<name>_<tag>.txt. Uses the bench session config
(AQE off, 64 shuffle partitions) so plans match what bench.py measures.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"plan-dump-{tag}")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.1"
qmap = e.queries()

TARGETS = [
    "anchor_corpus", "duplicate_spans", "contamination", "pipeline_v3",
    "pipeline_pretrain", "pipeline_curation", "cms_registers",
    "incremental_near_dup", "semdedup", "frontier_prioritized",
    "fingerprint", "term_retrieval", "dsir_select", "classifier_score",
    "minhash_lsh_pairs", "simhash", "crawl_order", "budget_admit",
    "ann_lsh_topk", "langid", "surprisal_buckets", "token_postings",
    "lm_surprisal", "sequence_pack", "resolve", "eligibility",
]


def dump(name: str, df):
    path = f"/root/repo/plans/r06/{name}_{tag}.txt"
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)")


for name in TARGETS:
    if only and name not in only:
        continue
    try:
        dump(name, qmap[name](spark, SF))
    except Exception as ex:  # noqa: BLE001
        print(f"FAIL {name}: {ex}")

# the bench workload pipelines (headline + narrow)
if not only or "frontier_round" in only:
    from pyspark.sql import functions as F

    from ideacrawler_spark.functions.urlnorm import canonicalize_udf
    from ideacrawler_spark.operators.admission import admit_budget
    from ideacrawler_spark.operators.dedup import anti_join_seen, first_occurrence
    from ideacrawler_spark.operators.rank import global_rank
    from ideacrawler_spark.plans.bench_workload import gen_frontier, gen_seen

    n = 1_000_000
    parts = 8
    frontier = gen_frontier(spark, n, parts)
    seen = gen_seen(spark, n, parts)
    canon = frontier.withColumn("url_norm", canonicalize_udf()(F.col("url")))
    cand = canon.select("url_norm", "host", "depth", "seq")
    firsts = first_occurrence(cand, key="url_norm", order_cols=("depth", "seq"))
    try:
        fresh = anti_join_seen(firsts, seen, key="url_norm", partitioned=True)
    except TypeError:
        fresh = anti_join_seen(firsts, seen, key="url_norm")
    admitted, _carried = admit_budget(
        fresh.withColumnRenamed("url_norm", "url"), F.lit(500), None,
        host_budget_max=500)
    ranked = global_rank(admitted, ["depth", "seq"], out_col="fetch_seq",
                         num_partitions=parts)
    dump("frontier_round", ranked)

spark.stop()
