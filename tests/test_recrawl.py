"""Unit tests for the recrawl lifecycle (operators/recrawl.py):
hand-computed snapshot-diff statuses and exponential-backoff schedules."""

from ideacrawler_spark.operators.recrawl import (
    recrawl_schedule,
    snapshot_delta,
)


def test_snapshot_delta_statuses(spark):
    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "url string, fp long")
    new = spark.createDataFrame(
        [("b", 2), ("c", 9), ("d", 4)], "url string, fp long")
    got = {r["url"]: r["status"]
           for r in snapshot_delta(old, new).collect()}
    assert got == {"a": "gone", "b": "same", "c": "changed", "d": "new"}


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, snap int, fp long")


def test_recrawl_schedule_backoff_and_changes(spark):
    rows = (
        # u1: never changes over 4 obs -> tail 3, interval 2^3 = 8
        [("u1", s, 1) for s in range(4)]
        # u2: changes once at obs 2 -> tail 2, interval 4
        + [("u2", 0, 1), ("u2", 1, 2), ("u2", 2, 2), ("u2", 3, 2)]
        # u3: last obs is a change -> tail 0, interval 1
        + [("u3", 0, 1), ("u3", 1, 1), ("u3", 2, 2), ("u3", 3, 1)]
        # u4: single observation -> tail 0, interval base
        + [("u4", 5, 9)]
    )
    got = {r["url"]: (r["n_obs"], r["n_versions"], r["tail_stable"],
                      r["next_interval"], r["next_due"])
           for r in recrawl_schedule(_hist(spark, rows)).collect()}
    assert got == {
        "u1": (4, 1, 3, 8, 11),
        "u2": (4, 2, 2, 4, 7),
        "u3": (4, 2, 0, 1, 4),
        "u4": (1, 1, 0, 1, 6),
    }


def test_recrawl_schedule_interval_cap(spark):
    rows = [("u", s, 7) for s in range(9)]  # 8 stable tail obs
    r = recrawl_schedule(_hist(spark, rows), cap=6).collect()[0]
    assert r["tail_stable"] == 8
    assert r["next_interval"] == 64  # 2^min(8, 6)
    assert r["next_due"] == 8 + 64


def test_revalidate_merge_all_action_arms(spark):
    from ideacrawler_spark.operators.recrawl import revalidate_merge

    cols = "url string, fetch_ts long, status int, etag string, fp long, text string"
    store = spark.createDataFrame(
        [
            ("u/304", 10, 200, "e1", 1, "old-1"),
            ("u/200", 10, 200, "e2", 2, "old-2"),
            ("u/404", 10, 200, "e3", 3, "old-3"),
            ("u/500", 10, 200, "e4", 4, "old-4"),
            ("u/stale", 10, 200, "e5", 5, "old-5"),
        ],
        cols,
    )
    fetched = spark.createDataFrame(
        [
            ("u/304", 20, 304, "n1", 11, None),
            ("u/200", 20, 200, "n2", 12, "new-2"),
            ("u/404", 20, 404, "n3", 13, None),
            ("u/500", 20, 500, "n4", 14, None),
            ("u/new", 20, 200, "n6", 16, "new-6"),
            ("u/miss", 20, 404, "n7", 17, None),
        ],
        cols,
    )
    out = {r["url"]: r for r in revalidate_merge(store, fetched).collect()}
    assert len(out) == 7
    r = out["u/304"]  # refresh: body/etag/fp stay, ts advances
    assert (r["action"], r["fetch_ts"], r["etag"], r["fp"], r["text"]) == \
        ("refresh", 20, "e1", 1, "old-1")
    r = out["u/200"]
    assert (r["action"], r["etag"], r["text"]) == ("replace", "n2", "new-2")
    assert out["u/404"]["action"] == "drop"
    r = out["u/500"]  # transient: unchanged
    assert (r["action"], r["fetch_ts"], r["text"]) == ("keep", 10, "old-4")
    assert out["u/stale"]["action"] == "keep"
    r = out["u/new"]
    assert (r["action"], r["status"], r["text"]) == ("insert", 200, "new-6")
    r = out["u/miss"]  # 404 for a URL never stored
    assert (r["action"], r["fetch_ts"], r["text"]) == ("ignore", None, None)


def test_feed_refresh_override_arms(spark):
    """All four arms: fresh announcement resets backoff and falls due at
    the announcement; stale announcement and unannounced urls keep their
    schedule; announced-never-crawled urls become discovery rows."""
    from ideacrawler_spark.operators.recrawl import feed_refresh

    # (url, n_obs, n_versions, tail_stable, next_interval, next_due)
    # last observation = next_due - next_interval
    sched = spark.createDataFrame(
        [("u_fresh", 3, 2, 1, 2, 12),    # last obs 10
         ("u_stale", 4, 1, 3, 8, 28),    # last obs 20
         ("u_quiet", 2, 2, 0, 1, 6)],
        "url string, n_obs int, n_versions int, tail_stable int, "
        "next_interval int, next_due int")
    ann = spark.createDataFrame(
        [("u_fresh", 11), ("u_fresh", 9),   # max 11 > 10 → fresh
         ("u_stale", 20),                   # 20 <= 20 → stale
         ("u_new", 7), ("u_new", 5)],       # never crawled → discovery
        "url string, pub int")
    got = {r["url"]: r.asDict() for r in
           feed_refresh(sched, ann, base=1).collect()}
    assert got["u_fresh"] == dict(url="u_fresh", n_obs=3, n_versions=2,
                                  tail_stable=1, next_interval=1,
                                  next_due=11, n_ann=2, feed_fresh=1)
    assert got["u_stale"] == dict(url="u_stale", n_obs=4, n_versions=1,
                                  tail_stable=3, next_interval=8,
                                  next_due=28, n_ann=1, feed_fresh=0)
    assert got["u_quiet"] == dict(url="u_quiet", n_obs=2, n_versions=2,
                                  tail_stable=0, next_interval=1,
                                  next_due=6, n_ann=0, feed_fresh=0)
    assert got["u_new"] == dict(url="u_new", n_obs=0, n_versions=0,
                                tail_stable=0, next_interval=1,
                                next_due=7, n_ann=2, feed_fresh=1)
