"""Span-level duplicate detection, benchmark contamination, corpus mixture
weights, and a mergeable distinct-count sketch — the curation passes a
pretraining pipeline runs AFTER document-level dedup (textops/dedup.py).

``duplicate_spans`` re-expresses the suffix-array substring dedup of
Lee et al., *Deduplicating Training Data Makes Language Models Better*
(ACL 2022), at word-window granularity: every k-word window is hashed
map-side (array ops, no shuffle), one corpus-wide count over the 8-byte
window hashes finds verbatim repeats, duplicated positions join back per
doc, and equal-length intervals merge with a single lag() window
partitioned by doc — so the "is this span repeated anywhere in 100 TB?"
question costs one hash-keyed shuffle, not a suffix array.

``contamination`` is the benchmark-decontamination join (GPT-3 App. C /
PaLM-style n-gram overlap): the benchmark n-gram set is tiny and is
BROADCAST, so scanning 100 TB of documents for test-set leakage is a
map-side hash probe with no shuffle of the corpus.

``mixture_weights`` computes per-source sampling weights w ∝ √tokens
(the unigram-LM / DoReMi-init style square-root temperature) in exact
integer arithmetic (parts-per-million) so the oracle can value-check it.

``hll_registers`` materializes HyperLogLog registers (Flajolet et al. 2007)
as a 2^p-row DataFrame: bucket = h mod 2^p, rho = leading-zero rank of the
remaining bits. The registers are the mergeable sketch state — max() over
shards/days IS the union — and every step is exact integer arithmetic,
portable to the DuckDB oracle (no float harmonic mean inside the engine).

All four are pure DataFrame compositions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ideacrawler_spark.textops.dedup import words_col
from ideacrawler_spark.textops.hashing import h60

SPAN_K = 8          # duplicated-span window width, in tokens
BENCH_EVERY = 37    # synth benchmark = first SPAN_K words of every 37th doc
HLL_P = 8           # 2^8 = 256 registers


def window_hashes(docs: DataFrame, k: int = SPAN_K,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, hs): hs[i] = h60 of the k-word window starting at
    token i (0-based). Docs shorter than k tokens get an empty array.
    Map-side only — the explode/shuffle decision is the caller's."""
    w = words_col(text_col)
    n = F.size(w)
    hs = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: h60(F.concat_ws(" ", F.slice(w, i, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return docs.select(
        "doc_id", n.cast("int").alias("n_tokens"), hs.alias("hs")
    )


def hashed_windows(docs: DataFrame, k: int = SPAN_K,
                   text_col: str = "text") -> DataFrame:
    """:func:`window_hashes`, persisted. The md5 window pass is the
    dominant cost of every span operator, and each operator references it
    from more than one subtree (the position explode AND the global count
    side); worse, Catalyst's inferred not-null/not-empty filter below each
    ``posexplode`` re-evaluates the whole (non-codegen, higher-order)
    transform per row in an interpreted Filter — profiled at ~4 full md5
    passes per duplicate_spans run. Persisting materializes the pass ONCE;
    operators composed into one pipeline (pipeline_pretrain/v3 chain
    contamination + duplicate_spans) share the same cache entry because
    the canonicalized plan is identical. At warehouse scale this persist
    is the materialized window-signature table a production span-dedup
    maintains (MEMORY_AND_DISK, spills instead of OOMing)."""
    return window_hashes(docs, k=k, text_col=text_col).persist()


def duplicate_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Per-doc verbatim-duplicate coverage: (doc_id, n_tokens, n_dup_spans,
    n_dup_tokens), where a token position is "duplicated" iff it lies in a
    k-word window whose exact text occurs more than once in the corpus.

    Scale shape: the only corpus-sized shuffle carries (8-byte hash) keys
    for the global window count; the join back is hash-keyed; the interval
    merge is a lag() window partitioned by doc_id (per-doc rows are bounded
    by doc length, so no mega-partition). Overlapping/adjacent windows
    (gap ≤ k) coalesce into one span — the paper's "duplicated span", not
    one row per window."""
    base = hashed_windows(docs, k=k)
    pos = base.select("doc_id", F.posexplode("hs").alias("pos", "sh"))
    dup_sh = (
        pos.groupBy("sh").agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1).select("sh")
    )
    dup = pos.join(dup_sh, "sh").select("doc_id", "pos")
    win = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(win) > k, 1).otherwise(0),
    ).withColumn("island", F.sum("brk").over(win))
    spans = isl.groupBy("doc_id", "island").agg(
        (F.max("pos") - F.min("pos") + k).alias("len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_dup_spans"),
        F.sum("len").cast("long").alias("n_dup_tokens"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("int")
            .alias("n_dup_spans"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long")
            .alias("n_dup_tokens"),
        )
    )


def bench_ngrams(docs: DataFrame, k: int = SPAN_K,
                 every: int = BENCH_EVERY) -> DataFrame:
    """Deterministic synthetic benchmark set: the first k words of every
    ``every``-th doc (sandbox stand-in for a real eval-set n-gram list).
    One (sh) column, distinct — small by construction."""
    w = words_col()
    return (
        docs.filter((F.col("doc_id") % every) == 0)
        .filter(F.size(w) >= k)
        .select(h60(F.concat_ws(" ", F.slice(w, 1, k))).alias("sh"))
        .distinct()
    )


def contamination(docs: DataFrame, bench: DataFrame,
                  k: int = SPAN_K) -> DataFrame:
    """Benchmark-contamination scan: docs containing any benchmark k-gram
    verbatim → (doc_id, n_bench_hits = distinct benchmark n-grams found).

    The benchmark side is broadcast (eval sets are KBs; the corpus is TBs),
    so the probe is map-side: no shuffle of the document windows at all —
    the only exchange is the per-doc count aggregation of the (rare)
    hits."""
    pos = hashed_windows(docs, k=k).select(
        "doc_id", F.explode("hs").alias("sh")
    )
    return (
        pos.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").cast("int").alias("n_bench_hits"))
    )


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Per-source sampling weights for corpus mixing: weight ∝ √tokens
    (square-root temperature flattens head sources), reported as exact
    integer parts-per-million so the oracle can value-check.

    (source, n_docs, n_tokens, sqrt_tokens, weight_ppm). The normalizing
    window runs over the AGGREGATED dimension (one row per source), never
    the corpus — at 100 TB this is a window over a few hundred rows."""
    stats = docs.groupBy("source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum(F.size(words_col())).cast("long").alias("n_tokens"),
    )
    w = F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
    stats = stats.withColumn("sqrt_tokens", w)
    total = F.sum("sqrt_tokens").over(
        Window.partitionBy()  # one row per source: bounded, post-agg
    )
    return stats.select(
        "source", "n_docs", "n_tokens", "sqrt_tokens",
        F.expr("CAST(1000000 * sqrt_tokens AS BIGINT)")
        .alias("_num"),
        total.alias("_tot"),
    ).select(
        "source", "n_docs", "n_tokens", "sqrt_tokens",
        F.expr("_num DIV _tot").cast("long").alias("weight_ppm"),
    )


def cms_registers(docs: DataFrame, d: int = 4, w: int = 256,
                  text_col: str = "text") -> DataFrame:
    """Count-min sketch registers (Cormode & Muthukrishnan 2005) over the
    corpus token stream: (hrow, bucket, cnt) for d salted hash rows of w
    buckets. Estimate(count of tok) = min over rows of
    register[row][h_row(tok) mod w] — always >= the true count.

    Like hll_registers, the registers ARE the mergeable sketch state
    (elementwise SUM is the union, proven in test), and the build is one
    partial-aggregated groupBy: the map side explodes each token into d
    (row, bucket) cells (array ops, no shuffle), and every map task emits
    at most d*w partial rows regardless of input size. Salts are string
    prefixes through the portable h60, so the oracle rebuilds the exact
    registers."""
    tok = docs.select(F.explode(words_col(text_col)).alias("tok"))
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda r: F.struct(
            r.cast("int").alias("hrow"),
            (h60(F.concat(F.lit("cms"), r.cast("string"), F.lit(":"),
                          F.col("tok"))) % w).cast("int").alias("bucket"),
        ),
    )
    return (
        tok.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.hrow").alias("hrow"),
                 F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_lookup(registers, token: str, d: int = 4, w: int = 256) -> int:
    """Driver-side point estimate from collected registers: min over rows
    of the token's cell (the CMS read path; for tests/monitoring)."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    got = {(r["hrow"], r["bucket"]): r["cnt"] for r in registers}
    return min(got.get((r, h(f"cms{r}:{token}") % w), 0) for r in range(d))


def hll_registers(df: DataFrame, value_col: str, p: int = HLL_P) -> DataFrame:
    """HyperLogLog register table for approx-distinct of ``value_col``:
    (bucket, max_rho) with bucket = h60 mod 2^p and rho = position of the
    first 1-bit of the remaining 60-p bits (1-based; all-zero ⇒ 61-p).

    max(rho) per bucket is the whole sketch: registers from different
    partitions/shards/days merge by max, which is exactly what the
    partial-aggregated groupBy below does — the shuffle carries ≤ 2^p rows
    per map task regardless of input size. rho is derived from the length
    of bin(rest) (both engines print minimal binary), so every value is an
    exact integer the DuckDB oracle reproduces."""
    m = 1 << p
    width = 60 - p
    h = h60(F.col(value_col).cast("string"))
    rest = F.shiftright(h, p)  # exact: h is 60-bit, float div would round
    rho = F.when(
        rest > 0, F.lit(width + 1) - F.length(F.bin(rest))
    ).otherwise(F.lit(width + 1))
    return (
        df.select((h % m).cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )
