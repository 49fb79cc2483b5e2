"""Scalable deterministic global rank — dense sequence numbers without a
single-partition window.

The engine needs dense, deterministic discovery sequence numbers
(the batch analogue of the reference's per-job enqueue counter,
job.go:846-869). ``Window.orderBy(...)`` with no partition key funnels
every row through ONE task — fatal at 10^10 rows. Instead:

1. ``repartitionByRange`` on the order key (range partitioner → globally
   ordered partitions);
2. ``row_number`` within each physical partition (cheap: data already
   sorted, partition key = spark_partition_id);
3. per-partition counts (tiny aggregate) → driver → cumulative offsets →
   broadcast-joined back.

The resulting rank is independent of the sampled range boundaries because
the order key is strictly unique, so the output is deterministic across
runs and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols, out_col: str = "rank",
                offset: int = 0, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = offset + dense 0-based rank of the row in the total
    order given by ``order_cols`` (must be a strict total order)."""
    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    part = part.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*cols)
    # persist: the per-partition count below and the caller's action would
    # otherwise both recompute the (possibly UDF-heavy) upstream lineage
    ranked = part.withColumn("_rn", F.row_number().over(w)).persist()
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    counts.sort(key=lambda r: r["_pid"])
    offsets, acc = {}, offset
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["_n"]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    mapping = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return (
        ranked.withColumn(out_col, mapping[F.col("_pid")] + F.col("_rn") - 1)
        .drop("_pid", "_rn")
    )
