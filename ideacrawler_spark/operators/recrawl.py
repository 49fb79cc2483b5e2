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


def feed_refresh(schedule: DataFrame, announcements: DataFrame,
                 base: int = 1) -> DataFrame:
    """Feed-driven schedule override — the recrawl loop's use of the
    feed source (sources/feeds.py): a syndication entry announcing a
    publication AFTER our last observation is direct evidence the page
    changed, so the exponential backoff is overridden and the revisit
    falls due at the announcement.

    ``schedule``: output of :func:`recrawl_schedule` (last observation
    time recovered as next_due - next_interval); ``announcements``:
    (url, pub) integer publication times, e.g. ``pub_epoch`` from
    ``feed_to_entries`` on the history's time scale. Per url:

    - announced with max(pub) > last observation → ``feed_fresh`` = 1,
      ``next_interval`` resets to ``base``, ``next_due`` = max(pub);
    - announced but stale (max(pub) <= last obs) → schedule unchanged;
    - never announced → schedule unchanged, n_ann 0;
    - announced but never crawled → a DISCOVERY row: n_obs 0,
      n_versions 0, tail_stable 0, interval ``base``, due at max(pub).

    Scale shape: ONE partial-aggregated groupBy(url) on the (small)
    announcement side + ONE full-outer hash join on url; the schedule
    side — the 10^10-URL table — is never re-windowed or re-shuffled
    beyond that single key join. All outputs integers."""
    ann = announcements.groupBy("url").agg(
        F.max("pub").cast("int").alias("_pub_max"),
        F.count("*").cast("int").alias("n_ann"),
    )
    j = schedule.join(ann, "url", "full_outer")
    last_obs = F.col("next_due") - F.col("next_interval")
    fresh = F.col("_pub_max").isNotNull() & (
        F.col("next_due").isNull() | (F.col("_pub_max") > last_obs))
    return j.select(
        "url",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("int").alias("n_obs"),
        F.coalesce(F.col("n_versions"), F.lit(0)).cast("int")
         .alias("n_versions"),
        F.coalesce(F.col("tail_stable"), F.lit(0)).cast("int")
         .alias("tail_stable"),
        F.when(fresh, F.lit(base)).otherwise(F.col("next_interval"))
         .cast("int").alias("next_interval"),
        F.when(fresh, F.col("_pub_max")).otherwise(F.col("next_due"))
         .cast("int").alias("next_due"),
        F.coalesce(F.col("n_ann"), F.lit(0)).cast("int").alias("n_ann"),
        fresh.cast("int").alias("feed_fresh"),
    )


REVALIDATE_FIELDS = ("fetch_ts", "status", "etag", "fp", "text")


def revalidate_merge(store: DataFrame, fetched: DataFrame) -> DataFrame:
    """Conditional-GET merge — the apply step of the recrawl loop.

    ``store`` is the current page store, ``fetched`` the latest
    revalidation responses (If-None-Match / If-Modified-Since), both
    with columns (url, fetch_ts, status, etag, fp, text). Per URL:

    * 304 Not Modified  → ``refresh``: body/etag/fp stay stored, only
      fetch_ts advances (the whole point of validators: no bytes moved);
    * 200               → ``replace`` (or ``insert`` for a new URL);
    * 404/410           → ``drop``: the tombstone row is emitted with
      action='drop' so the caller can filter it from the next store but
      still count it in lineage;
    * 5xx/other         → ``keep``: transient failure, store unchanged;
    * not refetched     → ``keep``;
    * non-200 for an unknown URL → ``ignore`` (nothing to store).

    Scale shape: ONE full-outer join keyed on url (same co-partitioned
    shuffle as snapshot_delta), everything else map-side CASE — no
    second pass, no driver logic. 304s carry no body through the
    shuffle: the stored text never leaves its side of the join.
    """
    s = store.select(
        "url", *[F.col(c).alias(f"_s_{c}") for c in REVALIDATE_FIELDS])
    f = fetched.select(
        "url", *[F.col(c).alias(f"_f_{c}") for c in REVALIDATE_FIELDS])
    j = s.join(f, "url", "full_outer")
    action = (
        F.when(F.col("_s_fetch_ts").isNull() & (F.col("_f_status") == 200),
               F.lit("insert"))
        .when(F.col("_s_fetch_ts").isNull(), F.lit("ignore"))
        .when(F.col("_f_fetch_ts").isNull(), F.lit("keep"))
        .when(F.col("_f_status") == 304, F.lit("refresh"))
        .when(F.col("_f_status") == 200, F.lit("replace"))
        .when(F.col("_f_status").isin(404, 410), F.lit("drop"))
        .otherwise(F.lit("keep"))
    )
    take_new = F.col("action").isin("insert", "replace")
    return (
        j.withColumn("action", action)
        .select(
            "url", "action",
            F.when(F.col("action").isin("insert", "replace", "refresh"),
                   F.col("_f_fetch_ts"))
            .otherwise(F.col("_s_fetch_ts")).cast("long").alias("fetch_ts"),
            F.when(take_new, F.col("_f_status"))
            .otherwise(F.col("_s_status")).cast("int").alias("status"),
            F.when(take_new, F.col("_f_etag"))
            .otherwise(F.col("_s_etag")).alias("etag"),
            F.when(take_new, F.col("_f_fp"))
            .otherwise(F.col("_s_fp")).cast("long").alias("fp"),
            F.when(take_new, F.col("_f_text"))
            .otherwise(F.col("_s_text")).alias("text"),
        )
    )
