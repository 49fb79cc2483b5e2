"""Politeness admission — the batch analogue of fetchbot's per-host workers.

The reference routes each URL to a per-host goroutine that sleeps
``crawl_delay`` between fetches (fetch.go:269-454) under a job-global
MaxConcurrentRequests semaphore (doer.go:36-41). The deterministic batch
model: per round, each host admits its first ``host_budget`` pending URLs
in (depth, seq) order — FIFO within host, BFS across depths — and the
round admits at most ``global_budget`` URLs overall in the same order.

Scale notes (10^10 frontier):
- the per-host window shuffles by host — exactly the partitioning the rest
  of the round wants anyway (repartition by host-hash); skewed hosts are
  bounded because a host emits at most ``host_budget`` admitted rows, and
  the pending tail ("carried") is written back without further wide ops;
- the global cap must NOT be a single-partition ``Window.orderBy``:
  ``admit_topk`` does a distributed bucket-histogram cutoff instead —
  one small aggregate collected to the driver, then a filter; only the
  single boundary bucket needs a window.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Order key packing: depth is bounded (< 2^23), per-round seq < 2^40.
_SEQ_BITS = 40
_DEPTH_MAX = 1 << 23  # depth*2^40 must stay under 2^63
_BUCKET_BITS = 28  # bucket = key >> 28 → ~dozens of buckets at test scale


def order_key(depth_col, seq_col):
    """(depth, seq) → one sortable long: depth*2^40 + seq.

    Packing is only order-preserving while seq < 2^40 and depth < 2^23
    (else the long overflows); rows past the bound FAIL LOUDLY instead of
    silently mis-ordering (a 10^10-URL frontier assigns ~2^33 seqs per
    round — 2^40 is headroom, not a ceiling to ride). ``assert_true``
    evaluates NULL on success, so the coalesce adds 0 per row."""
    seq = seq_col.cast("long")
    depth = depth_col.cast("long")
    guard = F.assert_true(
        (seq >= 0) & (seq < F.lit(1 << _SEQ_BITS))
        & (depth >= 0) & (depth < F.lit(_DEPTH_MAX)),
        F.lit(f"order_key packing overflow: need 0 <= seq < 2^{_SEQ_BITS} "
              f"and 0 <= depth < 2^23"),
    )
    # guard rides on the multiply's LEFT operand so it evaluates before
    # the multiplication can hit Spark's own ANSI overflow error
    depth_checked = depth + F.coalesce(guard.cast("long"), F.lit(0))
    return depth_checked * F.lit(1 << _SEQ_BITS) + seq


def admit_budget(frontier: DataFrame, host_budget_col, global_budget=None,
                 salt: int = 16,
                 host_budget_max: int | None = None) -> Tuple[DataFrame, DataFrame]:
    """Split frontier into (admitted, carried) for one round.

    ``frontier`` must carry columns host, depth, seq; ``host_budget_col`` is
    a Column giving the per-row host budget (usually joined from robots
    crawl_delay via JobSpec.host_budget math).

    Skew handling (the 10^10-frontier requirement): a mega-host would
    funnel all its pending URLs through ONE window task. Instead, a salted
    two-phase top-k: phase 1 takes the per-(host, salt) top-budget —
    ``salt`` parallel slices per host — which provably contains the true
    per-host top-budget; phase 2 ranks only those ≤ salt×budget survivors.
    Exact same result as the unsalted window, bounded task size.

    ``host_budget_max``: a LITERAL upper bound on every row's budget
    (driver-computable: max over the robots dim of JobSpec.host_budget).
    When given, the rank filters gain a ``rn <= literal`` conjunct, which
    lets Catalyst insert WindowGroupLimit — a partial per-task top-k that
    replaces the full window SORT with a bounded heap BEFORE the
    exchange. Same rows out (the literal dominates every per-row budget);
    profiled at 16M rows this was the single largest cost of the round
    prelude.
    """
    fr = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt))
    ).withColumn("_hb", host_budget_col)

    def cap(rn_col):
        cond = rn_col <= F.col("_hb")
        if host_budget_max is not None:
            cond = (rn_col <= F.lit(int(host_budget_max))) & cond
        return cond

    w1 = Window.partitionBy("host", "_salt").orderBy("depth", "seq")
    p1 = fr.withColumn("_rn1", F.row_number().over(w1))
    survivors = p1.filter(cap(F.col("_rn1"))).drop("_rn1")
    carried1 = p1.filter(~cap(F.col("_rn1"))).drop(
        "_rn1", "_salt", "_hb")
    w2 = Window.partitionBy("host").orderBy("depth", "seq")
    p2 = survivors.withColumn("_rn2", F.row_number().over(w2))
    host_admitted = p2.filter(cap(F.col("_rn2"))).drop(
        "_rn2", "_salt", "_hb")
    carried2 = p2.filter(~cap(F.col("_rn2"))).drop(
        "_rn2", "_salt", "_hb")
    carried = carried1.unionByName(carried2)
    if global_budget is None:
        return host_admitted, carried  # no global cap → skip the topk scan
    admitted, overflow = admit_topk(host_admitted, global_budget)
    return admitted, carried.unionByName(overflow)


def admit_topk(df: DataFrame, k: int) -> Tuple[DataFrame, DataFrame]:
    """Exact first-k rows of ``df`` by (depth, seq) without a global window.

    Distributed cutoff: histogram rows per key-bucket (small aggregate →
    driver), find the boundary bucket by cumulative count, admit all rows in
    buckets strictly below it, and window-rank ONLY the boundary bucket.
    Returns (admitted, rest)."""
    df = df.withColumn("_okey", order_key(F.col("depth"), F.col("seq")))
    df = df.withColumn("_bkt", (F.col("_okey") / F.lit(1 << _BUCKET_BITS)).cast("long"))
    hist = (
        df.groupBy("_bkt").count().orderBy("_bkt").collect()
    )
    total = sum(r["count"] for r in hist)
    if total <= k:
        return df.drop("_okey", "_bkt"), df.limit(0).drop("_okey", "_bkt")
    cum = 0
    boundary, below = None, 0
    for r in hist:
        if cum + r["count"] > k:
            boundary, below = r["_bkt"], cum
            break
        cum += r["count"]
    admitted_lo = df.filter(F.col("_bkt") < boundary)
    boundary_rows = df.filter(F.col("_bkt") == boundary)
    w = Window.partitionBy("_bkt").orderBy("_okey")
    ranked = boundary_rows.withColumn("_rn", F.row_number().over(w))
    admitted_b = ranked.filter(F.col("_rn") <= k - below).drop("_rn")
    rest_b = ranked.filter(F.col("_rn") > k - below).drop("_rn")
    rest = df.filter(F.col("_bkt") > boundary).unionByName(rest_b)
    return (
        admitted_lo.unionByName(admitted_b).drop("_okey", "_bkt"),
        rest.drop("_okey", "_bkt"),
    )
