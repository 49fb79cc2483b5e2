"""Unit tests for span-level dedup, contamination, mixture weights, and the
HLL register sketch (textops/spans.py) — hand-computed expectations on tiny
inputs, plus plan-shape pins for the scale-critical choices (broadcast
probe side, partial-agg register shuffle)."""

from pyspark.sql import functions as F

from ideacrawler_spark.textops.spans import (
    bench_ngrams,
    contamination,
    duplicate_spans,
    hll_registers,
    mixture_weights,
    window_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_hashes_counts_and_short_docs(spark):
    docs = _docs(spark, [(0, "a b c d e"), (1, "a b")])
    out = {r["doc_id"]: r for r in window_hashes(docs, k=3).collect()}
    # 5 tokens, k=3 → 3 windows; 2 tokens → none
    assert out[0]["n_tokens"] == 5 and len(out[0]["hs"]) == 3
    assert out[1]["n_tokens"] == 2 and out[1]["hs"] == []


def test_duplicate_spans_merges_overlapping_windows(spark):
    # docs 0 and 1 share the 6-token run "p q r s t u": with k=3 that is
    # 4 duplicated windows starting at positions 0..3, which must merge
    # into ONE span covering all 6 tokens in each doc. doc 2 is clean.
    docs = _docs(spark, [
        (0, "p q r s t u x1 y1"),
        (1, "z0 p q r s t u"),
        (2, "only unique words here nothing repeats"),
    ])
    out = {r["doc_id"]: r for r in duplicate_spans(docs, k=3).collect()}
    assert (out[0]["n_dup_spans"], out[0]["n_dup_tokens"]) == (1, 6)
    assert (out[1]["n_dup_spans"], out[1]["n_dup_tokens"]) == (1, 6)
    assert (out[2]["n_dup_spans"], out[2]["n_dup_tokens"]) == (0, 0)
    assert out[0]["n_tokens"] == 8 and out[1]["n_tokens"] == 7


def test_duplicate_spans_separate_islands(spark):
    # two duplicated 3-gram regions in doc 0, separated by a gap > k,
    # must stay two spans of 3 tokens each
    docs = _docs(spark, [
        (0, "a b c g1 g2 g3 g4 g5 d e f"),
        (1, "a b c"),
        (2, "d e f"),
    ])
    r0 = {r["doc_id"]: r for r in duplicate_spans(docs, k=3).collect()}[0]
    assert (r0["n_dup_spans"], r0["n_dup_tokens"]) == (2, 6)


def test_contamination_hits_and_broadcast_plan(spark):
    # bench = first 3 words of doc 0 ("alpha beta gamma"); doc 4 repeats
    # that 3-gram mid-text, doc 8 doesn't
    docs = _docs(spark, [
        (0, "alpha beta gamma delta eps"),
        (4, "xx alpha beta gamma yy"),
        (8, "totally clean doc here"),
    ])
    bench = bench_ngrams(docs, k=3, every=4)  # doc 0, 4, 8 eligible
    hits = contamination(docs, bench, k=3)
    got = {r["doc_id"]: r["n_bench_hits"] for r in hits.collect()}
    # bench set = {h(alpha beta gamma), h(xx alpha beta), h(totally clean
    # doc)}: doc 0 matches its own prefix; doc 4 matches its own prefix AND
    # doc 0's; doc 8 matches its own prefix
    assert got == {0: 1, 4: 2, 8: 1}
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench side must broadcast


def test_mixture_weights_integer_ppm(spark):
    docs = spark.createDataFrame(
        [(0, "w " * 99 + "w", "a"), (1, "w " * 24 + "w", "b")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in mixture_weights(docs).collect()}
    # tokens: a=100, b=25 → sqrt 10 and 5, total 15
    assert out["a"]["sqrt_tokens"] == 10 and out["b"]["sqrt_tokens"] == 5
    assert out["a"]["weight_ppm"] == 10_000_000 // 15
    assert out["b"]["weight_ppm"] == 5_000_000 // 15
    assert out["a"]["n_docs"] == 1 and out["a"]["n_tokens"] == 100


def test_hll_registers_exact_arithmetic(spark):
    from ideacrawler_spark.textops.hashing import h60
    df = spark.createDataFrame([(i,) for i in range(500)], "v long")
    regs = {r["bucket"]: r["max_rho"]
            for r in hll_registers(df, "v", p=8).collect()}
    # recompute expected registers in Python from the same h60 definition
    import hashlib
    exp = {}
    for i in range(500):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        b, rest = h % 256, h >> 8
        rho = 53 - rest.bit_length() if rest > 0 else 53
        exp[b] = max(exp.get(b, 0), rho)
    assert regs == exp
    # registers are a mergeable sketch: union by max must equal the
    # registers of the concatenated input
    df2 = spark.createDataFrame([(i,) for i in range(400, 900)], "v long")
    both = hll_registers(df.union(df2), "v", p=8)
    merged = (
        hll_registers(df, "v", p=8).union(hll_registers(df2, "v", p=8))
        .groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, both.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_hll_estimate_close_to_truth(spark):
    # standard HLL error is 1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    import math
    n, p = 2000, 8
    m = 1 << p
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "v string")
    regs = {r["bucket"]: r["max_rho"]
            for r in hll_registers(df, "v", p=p).collect()}
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    est = (0.7213 / (1 + 1.079 / m)) * m * m / s
    assert abs(est - n) / n < 0.20


def test_cms_registers_overestimate_and_merge(spark):
    """CMS point estimates are always >= the true count (min over d
    rows), exact for tokens without collisions at this size; registers
    merge by elementwise SUM (union law)."""
    from pyspark.sql import functions as F

    from ideacrawler_spark.textops.spans import cms_lookup, cms_registers

    docs = _docs(spark, [
        (0, "apple apple banana"),
        (1, "apple cherry"),
    ])
    regs = cms_registers(docs).collect()
    truth = {"apple": 3, "banana": 1, "cherry": 1}
    for tok, n in truth.items():
        assert cms_lookup(regs, tok) >= n
    # at 4 distinct tokens over 4x256 cells collisions are absent, so
    # estimates are exact
    assert {t: cms_lookup(regs, t) for t in truth} == truth
    assert cms_lookup(regs, "absent-token") == 0
    # union law: cms(A ++ B) == cms(A) + cms(B) elementwise
    d2 = _docs(spark, [(2, "banana banana date")])
    both = cms_registers(docs.union(d2))
    merged = (
        cms_registers(docs).union(cms_registers(d2))
        .groupBy("hrow", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, both.collect())) == \
        sorted(map(tuple, merged.collect()))
