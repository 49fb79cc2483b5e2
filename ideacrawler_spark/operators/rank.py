"""Scalable deterministic global rank — dense sequence numbers without a
single-partition window.

The engine needs dense, deterministic discovery sequence numbers
(the batch analogue of the reference's per-job enqueue counter,
job.go:846-869). ``Window.orderBy(...)`` with no partition key funnels
every row through ONE task — fatal at 10^10 rows. Instead:

1. ``repartitionByRange`` on the order key (range partitioner → globally
   ordered partitions) over a PERSISTED input: the range partitioner's
   sampling job and the shuffle itself would otherwise each recompute the
   caller's (typically UDF-heavy) upstream lineage — profiled on the 16M
   bench frontier this double-computed the whole canonicalize→dedup→
   admission pipeline (guide §1.2: fix the distributed algorithm first);
2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` to number
   rows within each physical partition: the id packs
   (partition_id << 33) | local_row_index, so pid/rn are recovered with
   two bit ops and NO ``Window.partitionBy(spark_partition_id())`` —
   the window's ClusteredDistribution requirement inserted a full extra
   Exchange+Sort of the ranked data (Spark cannot know the data is
   already partitioned by its own partition id);
3. per-partition counts (tiny aggregate, ≤ num_partitions rows) →
   cumulative offsets via a window over THAT tiny frame →
   broadcast-joined back.

Step 3 is fully lazy — no ``collect()``: the offsets live in a
num_partitions-row DataFrame whose single-partition window is over
partition COUNTS, not data rows, so the driver never blocks mid-plan
(round 1 paid two driver-blocking rank collects per crawl round).

The resulting rank is independent of the sampled range boundaries because
the order key is strictly unique, so the output is deterministic across
runs and parallelism levels. The per-partition numbering is deterministic
too: ids are assigned in the order of the explicit sortWithinPartitions,
so a recomputed (cache-evicted, retried) partition reproduces the same
ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


SMALL_RANK_ROWS = 131072  # single-task sort is cheaper below this


def global_rank(df: DataFrame, order_cols, out_col: str = "rank",
                offset: int = 0, num_partitions: int | None = None,
                track: list | None = None,
                small_hint: int | None = None,
                persist_input: bool = False) -> DataFrame:
    """Add ``out_col`` = offset + dense 0-based rank of the row in the total
    order given by ``order_cols`` (must be a strict total order).

    ``track``: optional list the internal persisted frame is appended to,
    so long-running callers (the crawl round loop) can unpersist it once
    the round's outputs are materialized — otherwise the cache pins
    memory for the session.

    ``persist_input``: opt-in cache of the input before the range shuffle
    so the boundary-sampling job does not recompute an expensive,
    un-cached upstream (see inline note).

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
    # persist_input: the range partitioner's boundary-sampling job executes
    # the child once and the shuffle executes it again — for a caller whose
    # upstream is UDF-heavy AND un-cached (the bench frontier pipeline)
    # that doubles the whole pipeline, so such callers opt in. For cheap or
    # already-cached upstreams (a parquet projection, a round's persisted
    # mid-frames) the extra materialization costs more than the re-run.
    if persist_input:
        src = df.persist()
        if track is not None:
            track.append(src)
    else:
        src = df
    if num_partitions:
        part = src.repartitionByRange(num_partitions, *cols)
    else:
        part = src.repartitionByRange(*cols)
    # number rows inside each range partition WITHOUT a window: the id is
    # (pid << 33) | row_index in the sortWithinPartitions order, so the
    # split below is exact and no Exchange(_pid)+Sort is ever planned
    part = (
        part.sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .select(
            "*",
            F.shiftrightunsigned(F.col("_mid"), 33).cast("int").alias("_pid"),
            (F.col("_mid") % F.lit(1 << 33) + 1).cast("int").alias("_rn"),
        )
        .drop("_mid")
    )
    # persist: the offsets subquery and the caller's action would otherwise
    # both recompute the range shuffle
    ranked = part.persist()
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
