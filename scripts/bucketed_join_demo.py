"""Co-located fetch join — the 100 TB answer to the engine's one
remaining full-width shuffle.

The crawl round's heaviest exchange is ``frontier ⨝ pages`` (html payloads
move). In production both live in Iceberg with a shared
``bucket(N, url_hash)`` partition spec; this demo reproduces the effect
with Spark managed bucketed tables (same mechanism: hash-bucketed,
sorted-by-key files on both sides ⇒ SortMergeJoin with ZERO Exchange):

    python scripts/bucketed_join_demo.py [n_pages] [n_frontier]

Prints one JSON line: exchange counts + wall times, bucketed vs plain.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_frontier = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    warehouse = tempfile.mkdtemp(prefix="bucketdemo_")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def urls(df):
        return df.select(
            F.concat(
                F.lit("http://host"),
                F.pmod(F.xxhash64("id"), F.lit(997)).cast("string"),
                F.lit(".example/p/"), F.col("id").cast("string"),
            ).alias("url"),
            F.col("id"),
        )

    pages = urls(spark.range(0, n_pages, 1, 16)).withColumn(
        "html", F.repeat(F.lit("x"), 200).cast("binary")
    ).withColumn("status", F.lit(200))
    frontier = urls(spark.range(0, n_frontier, 1, 16)).select(
        F.col("url").alias("url_norm"),
        (F.col("id") % 6).cast("int").alias("depth"),
        F.col("id").alias("seq"),
    )

    BUCKETS = 16
    pages.write.mode("overwrite").bucketBy(BUCKETS, "url").sortBy("url") \
        .saveAsTable("pages_b")
    frontier.write.mode("overwrite").bucketBy(BUCKETS, "url_norm") \
        .sortBy("url_norm").saveAsTable("frontier_b")
    # plain (unbucketed) copies of the same data
    pages.write.mode("overwrite").saveAsTable("pages_p")
    frontier.write.mode("overwrite").saveAsTable("frontier_p")

    def run(pt, ft):
        p = spark.table(pt)
        f = spark.table(ft)
        j = f.join(p, on=f.url_norm == p.url, how="left").select(
            "url_norm", "depth", "seq", "status", F.length("html").alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        exchanges = plan.count("Exchange")
        j.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        j.write.format("noop").mode("overwrite").save()
        return exchanges, round(time.monotonic() - t0, 2)

    ex_b, t_b = run("pages_b", "frontier_b")
    ex_p, t_p = run("pages_p", "frontier_p")
    print(json.dumps(dict(
        n_pages=n_pages, n_frontier=n_frontier, buckets=BUCKETS,
        bucketed=dict(exchanges=ex_b, seconds=t_b),
        plain=dict(exchanges=ex_p, seconds=t_p),
        speedup=round(t_p / t_b, 2) if t_b else None,
    )))
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS frontier_b")
    spark.sql("DROP TABLE IF EXISTS pages_p")
    spark.sql("DROP TABLE IF EXISTS frontier_p")
    spark.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
