"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016) — the
iterative-algorithm class (like IVF/PQ Lloyd training in similarity.py),
driven as a short DataFrame loop with ONE bounded single-row collect per
merge step.

Training runs over the corpus *word-type* table (word, count) — the
classic BPE formulation — so every iteration aggregates vocabulary-sized
data, not corpus-sized: at 100 TB the word-type table is the heavy-tailed
few-billion-row dimension, the pair count is one partial-aggregated
shuffle over it, and the argmax pair is an ordered limit(1).

Symbol strings use a doubled unit-separator encoding so that merge
application is plain string ``replace`` with correct greedy left-to-right
BPE semantics even for ADJACENT pair occurrences: symbols are joined and
wrapped by SEP2 = "\\x1f\\x1f", and merging (L, R) replaces
``\\x1fL\\x1f\\x1fR\\x1f`` with ``\\x1fLR\\x1f`` — the pattern consumes one
separator from each side's pair, so back-to-back matches ("a a a a" under
merge (a,a) → "aa aa", not "aa a a") still align. Spark's ``replace`` and
DuckDB's ``replace`` share non-overlapping left-to-right semantics, which
is exactly greedy BPE, so the oracle re-learns the same merges from
scratch with unrolled SQL stages.

Ties in the pair argmax break deterministically: highest count, then
lexicographically smallest (left, right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\x1f"
SEP2 = SEP + SEP
N_MERGES = 4


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): corpus word-type table — one shuffle, map-side
    partial-aggregated."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _wrapped_symbols(word_col) -> object:
    """word → SEP2-joined-and-wrapped character symbols:
    'abc' → '␟␟a␟␟b␟␟c␟␟'."""
    return F.concat(F.lit(SEP2), F.regexp_replace(word_col, "(.)", "$1" + SEP2))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over the vocab's current
    symbol strings."""
    syms = F.filter(F.split(F.col("s"), SEP2), lambda x: x != F.lit(""))
    n = F.size(syms)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("lhs"),
                F.element_at(syms, i + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table (step, lhs, rhs, merged, pair_count) — the tokenizer artifact.

    Each step: pair-count shuffle over the vocab → ordered limit(1)
    argmax (ONE row collected) → merge applied map-side via replace()."""
    spark = docs.sparkSession
    # persisted: the step-0 argmax collect and the step-1 collect (whose
    # lazily-checkpointed vocab still chains from here) would otherwise
    # each re-run the corpus-wide word-type aggregation — and because the
    # cache is keyed on the canonicalized plan, bpe_token_count's encode
    # pass over the same word_types(docs) reuses it too instead of a
    # third corpus pass
    vocab = word_types(docs).persist().select(
        _wrapped_symbols(F.col("word")).alias("s"), "cnt"
    )
    merges = []
    for step in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], top[0]["c"]
        merges.append((step, lhs, rhs, lhs + rhs, int(c)))
        vocab = vocab.select(
            F.replace(
                F.col("s"),
                F.lit(SEP + lhs + SEP2 + rhs + SEP),
                F.lit(SEP + lhs + rhs + SEP),
            ).alias("s"),
            "cnt",
        )
        # keep the lineage shallow across iterations (4 replaces is fine,
        # but localCheckpoint mirrors the ivf_train/pq_train pattern and
        # keeps re-planning O(1) per step at production merge counts)
        vocab = vocab.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, "
                "pair_count long",
    )


def apply_merges(vocab: DataFrame, merges: list[tuple]) -> DataFrame:
    """Apply an ordered merge list to a (word, cnt) vocab → adds the final
    symbol string ``s`` and per-word token count ``n_sym``."""
    s = _wrapped_symbols(F.col("word"))
    for _, lhs, rhs, _, _ in merges:
        s = F.replace(
            s,
            F.lit(SEP + lhs + SEP2 + rhs + SEP),
            F.lit(SEP + lhs + rhs + SEP),
        )
    out = vocab.withColumn("s", s)
    return out.withColumn(
        "n_sym",
        F.size(F.filter(F.split(F.col("s"), SEP2), lambda x: x != F.lit("")))
        .cast("int"),
    )


def bpe_token_count(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): per-doc token counts under the
    corpus-trained BPE — encoding is a hash join of the doc's words
    against the (small-relative-to-corpus) vocab's per-word symbol
    counts. Uses the merges learned by bpe_train on the same docs."""
    merges = [tuple(r) for r in bpe_train(docs, n_merges=n_merges)
              .orderBy("step").collect()]
    per_word = apply_merges(
        word_types(docs).select("word", "cnt"), merges
    ).select("word", "n_sym")
    doc_words = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        doc_words.join(per_word, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
    )


def tokenizer_fertility(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Per-language tokenizer fertility: (lang, n_docs, n_words,
    n_bpe_tokens, fert_x1000) with fert_x1000 = BPE tokens per 1000
    whitespace words — the standard multilingual-tokenizer health
    metric (a language whose fertility balloons is being shredded into
    bytes and will be under-trained at a fixed token budget). Integer
    exact: one join of the per-doc counts back to the lang column and
    one partial-aggregated groupBy(lang)."""
    per_doc = bpe_token_count(docs, n_merges=n_merges)
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "lang", "n_docs", "n_words", "n_bpe_tokens",
            F.expr("(n_bpe_tokens * 1000) div n_words").cast("long")
            .alias("fert_x1000"),
        )
    )
