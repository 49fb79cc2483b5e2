"""Text analysis for training-data pipelines: corpus-trained language ID,
quality scoring, token counting, document fingerprinting.

Integer/string outputs only (oracle-portable); everything is built-in
DataFrame ops — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ideacrawler_spark.textops.dedup import shingles_col, words_col
from ideacrawler_spark.textops.hashing import P31, h60

TOP_WORDS_PER_LANG = 20


def langid_ngram(docs: DataFrame) -> DataFrame:
    """Corpus-trained n-gram (word-unigram) language ID.

    Profile = the TOP_WORDS_PER_LANG most frequent words per language
    (trained on the corpus's own lang labels); a doc's predicted language
    is the profile with the most distinct matching words (ties → lang asc).
    Output: (doc_id, lang, pred_lang, matched).
    """
    wrd = docs.select("doc_id", "lang", F.explode(words_col()).alias("w"))
    freq = wrd.groupBy("lang", "w").agg(F.count("*").alias("n"))
    wprof = Window.partitionBy("lang").orderBy(F.desc("n"), F.col("w"))
    profile = (
        freq.withColumn("_r", F.row_number().over(wprof))
        .filter(F.col("_r") <= TOP_WORDS_PER_LANG)
        .select(F.col("lang").alias("p_lang"), "w")
    )
    doc_words = docs.select(
        "doc_id", "lang", F.explode(F.array_distinct(words_col())).alias("w")
    )
    scored = (
        doc_words.join(profile, "w")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count("*").alias("matched"))
    )
    wbest = Window.partitionBy("doc_id").orderBy(F.desc("matched"), F.col("p_lang"))
    return (
        scored.withColumn("_r", F.row_number().over(wbest))
        .filter(F.col("_r") == 1)
        .select("doc_id", "lang", F.col("p_lang").alias("pred_lang"), "matched")
    )


# Small fixed stopword list — quality scoring wants a RATIO signal, not a
# linguistics-grade lexicon; identical literal list in the DuckDB oracle.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)


def quality_score(docs: DataFrame) -> DataFrame:
    """Integer quality facets: word counts, type-token ratio (×1000,
    integer division — exact), longest word, punctuation count, stopword
    count + ratio (×1000). Output: (doc_id, n_words, n_distinct,
    ttr_x1000, max_word_len, n_punct, n_stop, stop_x1000)."""
    w = words_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x))))
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.expr(
            "div(1000 * size(array_distinct(split(text, ' '))), "
            "size(split(text, ' ')))"
        ).alias("ttr_x1000"),
        F.array_max(F.transform(w, F.length)).alias("max_word_len"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.,!?;:]"), F.lit(0))
               ).alias("n_punct"),
        n_stop.alias("n_stop"),
        # div(): exact integer division (float '/' + floor can be off by
        # one ULP across engines — the round-1 oracle hazard)
        (n_stop * 1000).cast("long").alias("_s1000"),
    ).withColumn(
        "stop_x1000", F.expr("div(_s1000, n_words)")
    ).drop("_s1000")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count
    ([a-z]+ | digits | single other non-space). Output is all-integer."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
            )
        ).alias("re_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


def fingerprint(docs: DataFrame, k: int = 4) -> DataFrame:
    """Winnowing-style document fingerprint over k-gram shingle hashes:
    (min, max, xor) of the rolling shingle hash set — order-sensitive
    content signature with order-free (thus shuffle-safe) aggregation.
    Output: (doc_id, fp_min, fp_max, fp_xor, n_shingles)."""
    sh = docs.select(
        "doc_id", F.explode(shingles_col(k=k)).alias("shingle")
    ).select("doc_id", (h60(F.col("shingle")) % F.lit(P31)).alias("sh"))
    return sh.groupBy("doc_id").agg(
        F.min("sh").alias("fp_min"),
        F.max("sh").alias("fp_max"),
        F.expr("bit_xor(sh)").alias("fp_xor"),
        F.count("*").alias("n_shingles"),
    )


def ngram_repetition(docs, n: int = 2, text_col: str = "text"):
    """Intra-document repetition signal (the Gopher repetition rules'
    building block): the count of the most-repeated word n-gram in each
    doc and the total n-gram count — an exact integer fraction
    (top_count / n_grams); high ratios flag template/spam pages.
    Output: (doc_id, top_count, n_grams).

    Pure explode → two partial-aggregated groupBys; the shuffle key is
    (doc_id, gram) then doc_id — no skew beyond document size."""
    from pyspark.sql import functions as F

    w = F.split(F.col(text_col), " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, n)),
                ),
            ).otherwise(F.array()),
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(
        F.count("*").alias("_c"))
    agg = per_gram.groupBy("doc_id").agg(
        F.max("_c").cast("int").alias("top_count"),
        F.sum("_c").cast("int").alias("n_grams"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("top_count"), F.lit(0)).alias("top_count"),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        )
    )


def source_stats(docs, strata_col: str = "source"):
    """Host/source-level curation stats (the RefinedWeb/CCNet move of
    filtering DOMAINS, not just documents): per stratum, document count,
    exact char/token totals, language spread, and the dominant language
    (count-desc, then lexicographic — deterministic). One partial-
    aggregated groupBy per stage; the stratum key is the shuffle key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = docs.groupBy(strata_col).agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
    )
    by_lang = docs.groupBy(strata_col, "lang").agg(
        F.count("*").alias("_n"))
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("_n"), F.col("lang"))
    top = (
        by_lang.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(strata_col, F.col("lang").alias("top_lang"),
                F.col("_n").cast("int").alias("top_lang_docs"))
    )
    return base.join(top, strata_col)


def lm_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-trained unigram-LM surprisal in WHOLE BITS — the CCNet-style
    quality signal (docs whose tokens are corpus-rare score high; fluent
    common text scores low), made integer-exact so it is oracle-portable:
    per-token surprisal ≈ -log2 p(w) is approximated by
    ``bitlen(N) - bitlen(cnt(w))`` where ``bitlen`` is the binary-string
    length (floor(log2)+1 computed WITHOUT floats — float log2 rounds
    differently across engines at power-of-two boundaries).

    Train + score in one plan: token unigram counts (one partial-agg
    groupBy), corpus total as a 1-row broadcast, a hash join back on the
    token (vocab can exceed broadcast size at 100 TB — the shuffle join
    on ``w`` is the scale-safe shape, AQE will broadcast when the vocab
    is small), then a per-doc sum. Output: (doc_id, n_tokens,
    surprisal_bits, mean_bits_x100) — all integers.
    """
    wrd = docs.select("doc_id", F.explode(words_col(text_col)).alias("w"))
    counts = wrd.groupBy("w").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("N"))
    scored = (
        wrd.join(counts, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.length(F.bin(F.col("N")))
             - F.length(F.bin(F.col("cnt")))).alias("bits"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
        )
    )
    return scored.withColumn(
        "mean_bits_x100", F.expr("div(100 * surprisal_bits, n_tokens)")
    )


def token_quantiles(docs: DataFrame,
                    pcts: tuple = (25, 50, 75, 90, 99),
                    text_col: str = "text") -> DataFrame:
    """Exact corpus percentiles of per-doc token counts — the curation
    observability numbers (what does the p99 doc look like?) computed as
    exact order statistics, not approximations: percentile p = the
    smallest count v with |docs with count <= v| >= ceil(p*n/100)
    (percentile_disc semantics, integer-exact in both engines).

    Scale shape: the corpus collapses to a token-count HISTOGRAM first
    (one partial-aggregated groupBy; a few thousand distinct integer
    counts regardless of corpus size), so the cumsum window and the
    percentile probe run over bounded data."""
    hist = docs.select(
        F.size(words_col(text_col)).alias("v")
    ).groupBy("v").agg(F.count("*").alias("_cnt"))
    cum = hist.select(
        "v",
        F.sum("_cnt").over(
            Window.orderBy("v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.sum("_cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    )
    pdf = docs.sparkSession.createDataFrame(
        [(int(p),) for p in pcts], "pct int")
    return (
        pdf.crossJoin(cum)
        .filter(F.expr("_cum >= CAST(div(pct * _n + 99, 100) AS BIGINT)"))
        .groupBy("pct")
        .agg(F.min("v").cast("int").alias("value"))
    )


def surprisal_buckets(docs: DataFrame, n_buckets: int = 3,
                      text_col: str = "text") -> DataFrame:
    """CCNet-style perplexity bucketing: assign each doc to a corpus
    percentile bucket of its mean unigram surprisal (0 = head/fluent,
    n_buckets-1 = tail/rare). Bucket of score v =
    ``(n_buckets * |docs with score < v|) DIV n`` — equal scores always
    share a bucket, so the rule is deterministic with no tie ambiguity
    and exact in integer arithmetic.

    Scale shape: the percentile boundary pass runs over the score
    HISTOGRAM (groupBy score → one row per distinct integer score, a few
    thousand rows regardless of corpus size), so the single-partition
    cumsum window touches bounded data — the corpus itself only sees the
    scoring joins of lm_surprisal plus one hash join back on the score."""
    scored = lm_surprisal(docs, text_col=text_col)
    hist = scored.groupBy("mean_bits_x100").agg(
        F.count("*").alias("_cnt"))
    w = Window.orderBy("mean_bits_x100").rowsBetween(
        Window.unboundedPreceding, -1)
    boundaries = hist.select(
        "mean_bits_x100",
        F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_below"),
        F.sum("_cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    ).select(
        "mean_bits_x100",
        F.expr(f"CAST(div({n_buckets} * _below, _n) AS INT)")
        .alias("bucket"),
    )
    return scored.join(boundaries, "mean_bits_x100").select(
        "doc_id", "n_tokens", "surprisal_bits", "mean_bits_x100", "bucket"
    )
