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
3. per-partition counts (tiny aggregate, ≤ num_partitions rows) →
   cumulative offsets via a window over THAT tiny frame →
   broadcast-joined back.

Step 3 is fully lazy — no ``collect()``: the offsets live in a
num_partitions-row DataFrame whose single-partition window is over
partition COUNTS, not data rows, so the driver never blocks mid-plan
(round 1 paid two driver-blocking rank collects per crawl round).

The resulting rank is independent of the sampled range boundaries because
the order key is strictly unique, so the output is deterministic across
runs and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


SMALL_RANK_ROWS = 131072  # single-task sort is cheaper below this


def global_rank(df: DataFrame, order_cols, out_col: str = "rank",
                offset: int = 0, num_partitions: int | None = None,
                track: list | None = None,
                small_hint: int | None = None) -> DataFrame:
    """Add ``out_col`` = offset + dense 0-based rank of the row in the total
    order given by ``order_cols`` (must be a strict total order).

    ``track``: optional list the internal persisted frame is appended to,
    so long-running callers (the crawl round loop) can unpersist it once
    the round's outputs are materialized — otherwise the cache pins
    memory for the session.

    ``small_hint``: a caller-KNOWN upper bound on the row count (e.g. the
    round's admission budget). When it proves the input fits in one task
    (≤ SMALL_RANK_ROWS), rank via a single-exchange window instead —
    ``repartitionByRange`` costs a range-SAMPLING job plus a shuffle,
    pure overhead for small-bounded rounds, and the single partition does
    not strangle downstream parallelism because the next operator is a
    broadcast join whose output follows the big side's partitioning. At
    the 10^10-URL target the budget bound exceeds the threshold and the
    scalable path runs unchanged; this is an adaptive switch on a proven
    bound, never a guess from sampled stats."""
    cols = [F.col(c) for c in order_cols]
    if small_hint is not None and small_hint <= SMALL_RANK_ROWS:
        w = Window.orderBy(*cols)
        return df.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + F.lit(offset)).cast("long"))
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    part = part.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*cols)
    # persist: the offsets subquery and the caller's action would otherwise
    # both recompute the (possibly UDF-heavy) upstream lineage
    ranked = part.withColumn("_rn", F.row_number().over(w)).persist()
    if track is not None:
        track.append(ranked)
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_n"))
    # single-partition window over ≤num_partitions COUNT rows (not data)
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        (F.coalesce(F.sum("_n").over(wo), F.lit(0)) + F.lit(offset))
        .alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_rn") - 1)
        .drop("_pid", "_rn", "_off")
    )
