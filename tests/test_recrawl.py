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
