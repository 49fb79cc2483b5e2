"""Recrawl lifecycle: snapshot diffing and change-driven revisit
scheduling.

A production crawl is not one pass — it's a loop: fetch a snapshot,
diff it against the last one, and schedule the next visit per URL by
how often its content actually changes (stable pages back off
exponentially, churny pages stay hot). The reference runs one job per
crawl and leaves recrawl policy to the caller; these operators are the
Spark-side building blocks of that loop, all integer-exact.

Scale shapes:

* ``snapshot_delta`` — ONE full-outer join keyed on url between two
  (url, fp) snapshots; everything else is a map-side CASE. At 10^10
  URLs that is one co-partitioned shuffle per side, no skew hazard
  beyond the url key itself (unique per row).

* ``recrawl_schedule`` — per-URL windows over the (short, bounded)
  snapshot history: the window partitions by url (groups = #snapshots
  per url, a handful of rows), then one partial-aggregated groupBy(url).
  Nothing corpus-sized crosses a single partition.
"""

from pyspark.sql import DataFrame, Window, functions as F


def snapshot_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-URL status between two crawl snapshots of (url, fp) rows
    (fp = any integer content fingerprint): ``new`` (absent before),
    ``gone`` (absent now), ``changed`` (fingerprint differs), ``same``.
    """
    o = old.select("url", F.col("fp").alias("_fp_old"))
    n = new.select("url", F.col("fp").alias("_fp_new"))
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("new"))
        .when(F.col("_fp_new").isNull(), F.lit("gone"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return o.join(n, "url", "full_outer").select(
        "url", status.alias("status"))


def recrawl_schedule(hist: DataFrame, base: int = 1,
                     cap: int = 6) -> DataFrame:
    """Exponential-backoff revisit scheduling from a (url, snap, fp)
    observation history: the classic change-driven recrawl policy
    (cf. Cho & Garcia-Molina's freshness line) in integer form.

    Per url, with observations ordered by snap:
      n_obs       — observations seen,
      n_versions  — distinct fingerprints (content versions),
      tail_stable — consecutive UNCHANGED observations at the end of
                    the history (0 if the last observation changed),
      next_interval = base << min(tail_stable, cap)   (doubles per
                    stable observation, capped),
      next_due    = last snap + next_interval.

    All outputs integers; ties and absences are exact (a url observed
    once has tail_stable 0 and interval ``base``).
    """
    w = Window.partitionBy("url").orderBy("snap")
    x = hist.select(
        "url", "snap", "fp",
        F.row_number().over(w).alias("_idx"),
        F.lag("fp").over(w).alias("_prev"),
    )
    agg = x.groupBy("url").agg(
        F.max("_idx").cast("int").alias("n_obs"),
        F.countDistinct("fp").cast("int").alias("n_versions"),
        # last index where content changed vs the previous observation
        # (or where there was no previous): index 1 always counts as a
        # "change" so a single observation yields tail_stable 0.
        F.max(
            F.when(
                F.col("_prev").isNull()
                | (F.col("fp") != F.col("_prev")),
                F.col("_idx"))
        ).alias("_last_change"),
        F.max("snap").cast("int").alias("last_snap"),
    )
    tail = (F.col("n_obs") - F.col("_last_change")).cast("int")
    # F.shiftleft only takes a literal bit count — build the expression
    interval = F.expr(
        f"cast(shiftleft({base}, least(cast(n_obs - _last_change as int),"
        f" {cap})) as int)")
    return agg.select(
        "url", "n_obs", "n_versions",
        tail.alias("tail_stable"),
        interval.alias("next_interval"),
        (F.col("last_snap") + interval).cast("int").alias("next_due"),
    )
