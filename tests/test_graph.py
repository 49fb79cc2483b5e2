"""Unit tests for the host link-graph analytics (operators/graph.py):
hand-computed degree expectations, an exact PageRank fixpoint case, and an
independent pure-Python integer reference for the general case."""

from ideacrawler_spark.operators.graph import host_degrees, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_host_degrees_hand_graph(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                       ("d", "a")])
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in host_degrees(e).collect()}
    assert got == {"a": (2, 2), "b": (1, 1), "c": (1, 2), "d": (1, 0)}


def test_pagerank_two_cycle_is_exact_fixpoint(spark):
    """a<->b: each node's whole rank flows to the other, so
    r' = 150000 + (85 * 1000000) // 100 = 1000000 — the initial value is
    an exact integer fixpoint and must be preserved bit-for-bit."""
    e = _edges(spark, [("a", "b"), ("b", "a")])
    got = {r["node"]: r["pr"] for r in pagerank(e, n_iter=6).collect()}
    assert got == {"a": 1_000_000, "b": 1_000_000}


def _pagerank_py(edges, n_iter, scale=1_000_000, d=(85, 100)):
    """Independent integer reference: same fixed-point model, dict-based."""
    d_num, d_den = d
    base = (d_den - d_num) * scale // d_den
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: scale for n in nodes}
    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {n: base + (d_num * s[n]) // d_den for n in nodes}
    return r


def test_pagerank_matches_integer_reference(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"),
             ("d", "c"), ("e", "a")]
    got = {r["node"]: r["pr"]
           for r in pagerank(_edges(spark, edges), n_iter=6).collect()}
    assert got == _pagerank_py(edges, n_iter=6)
    # dangling nodes (no out-edges would require e/no... here every node
    # with no IN-links sits at the base term after iteration 1
    assert got["d"] == 150_000 and got["e"] == 150_000


def test_pagerank_sink_node_keeps_base_mass(spark):
    """b is a pure sink (dangling): it accumulates but never emits;
    its mass leak is the documented simplification — totals shrink, the
    per-node values still match the integer reference exactly."""
    edges = [("a", "b"), ("c", "b")]
    got = {r["node"]: r["pr"]
           for r in pagerank(_edges(spark, edges), n_iter=3).collect()}
    assert got == _pagerank_py(edges, n_iter=3)
    assert got["a"] == got["c"] == 150_000
