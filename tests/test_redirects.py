"""Redirect-chain resolution (operators/redirects.py): pointer doubling
vs hand-computed chains, cycles, over-budget chains, duplicate sources."""
import pytest

from ideacrawler_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, max_hops=16):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    return {r["src"]: (r["final_url"], r["hops"], r["looped"]) for r in rows}


def test_simple_chain(spark):
    # a → b → c → d (terminal)
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, False),
        "b": ("d", 2, False),
        "c": ("d", 1, False),
    }


def test_cycle_flags_looped(spark):
    got = _resolve(spark, [("x", "y"), ("y", "x")])
    # 16 hops from x lands back on x (even cycle); still redirecting
    assert got["x"] == ("x", 16, True)
    assert got["y"] == ("y", 16, True)


def test_chain_longer_than_budget(spark):
    edges = [(f"c{i}", f"c{i+1}") for i in range(20)]  # c0..c20, c20 terminal
    got = _resolve(spark, edges)
    # dist(c0)=20 > 16: stops at c16 after 16 hops, still redirecting
    assert got["c0"] == ("c16", 16, True)
    # dist(c4)=16: exactly reaches the terminal on the last allowed hop
    assert got["c4"] == ("c20", 16, False)
    assert got["c10"] == ("c20", 10, False)


def test_duplicate_src_first_wins_min_dst(spark):
    got = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "t")])
    assert got["a"] == ("t", 2, False)  # min dst 'b' wins over 'z'


def test_max_hops_must_be_power_of_two(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=12)
