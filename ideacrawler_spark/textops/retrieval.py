"""Inverted-index retrieval over the documents table.

The query side of a webtext corpus: build token postings and rank
documents for a term query — the lookup layer a curation team uses to
inspect what the crawl actually contains ("show me the top docs for
these terms"). All scores are exact integers (the repo-wide oracle
discipline: no floats near a value hash), using the integer IDF
surrogate idf(t) = N div df(t) — monotone in the true idf, so rankings
agree with the classic tf-idf ordering on df ties and df order.

Scale shape: tokenize is a map pass; the postings/tf aggregation is one
partial-aggregated groupBy keyed on (doc_id, tok); the query-term join
broadcasts the (tiny) term list; the corpus size N joins in as a
broadcast one-row aggregate (no driver .count() round-trip); top-k is
a TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
never a full sort).
"""

from pyspark.sql import DataFrame, functions as F

from ideacrawler_spark.textops.dedup import words_col


def term_tf(docs: DataFrame, terms, text_col: str = "text") -> DataFrame:
    """(doc_id, tok, tf) for the query terms only — the postings slice
    the ranker consumes. Broadcast-joins the term list against the
    exploded token stream, then one partial-agg groupBy."""
    qt = docs.sparkSession.createDataFrame(
        [(t,) for t in sorted(terms)], "tok string")
    tok = docs.select(
        "doc_id", F.explode(words_col(text_col)).alias("tok"))
    return (
        tok.join(F.broadcast(qt), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def term_retrieval(docs: DataFrame, terms, k: int = 10,
                   text_col: str = "text") -> DataFrame:
    """Top-k documents for a bag-of-terms query, scored by
    sum over matched terms of tf(doc, t) * (N div df(t)) — rare terms
    dominate, ties break on doc_id ascending. Returns
    (doc_id, score, n_terms) with n_terms = how many distinct query
    terms the doc matched (the AND-ness signal)."""
    tf = term_tf(docs, terms, text_col)
    df_t = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.agg(F.count("*").cast("long").alias("n"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.expr("n div df")).cast("long")
            .alias("score"),
            F.count("*").cast("int").alias("n_terms"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def token_postings(docs: DataFrame, min_df: int = 2,
                   max_df: int = None,
                   text_col: str = "text") -> DataFrame:
    """Full inverted index: (tok, df, postings_csv) with postings_csv =
    the sorted doc_id list (CSV-serialized for cross-engine value
    hashing, same convention as outlink_sets), restricted to tokens
    appearing in >= min_df docs. One distinct + one partial-agg groupBy
    keyed on tok; min_df prunes the hapax tail that dominates
    vocabulary size.

    Scale hazard and its knob: a stopword-grade token's postings list
    is O(corpus) in ONE row — at 10^10 docs that's a multi-GB cell. Set
    ``max_df`` (the standard stopword cutoff) to drop those tokens; the
    collect_list then only runs on tokens whose df passed both bounds
    (the df filter is applied to a count-only first pass, BEFORE any
    postings list is materialized)."""
    tok = (
        docs.select("doc_id",
                    F.explode(words_col(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    if max_df is not None:
        dfs = tok.groupBy("tok").agg(F.count("*").alias("_df")).filter(
            (F.col("_df") >= min_df) & (F.col("_df") <= max_df))
        tok = tok.join(dfs.select("tok"), "tok")
    return (
        tok.groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
            .alias("postings_csv"),
        )
        .filter(F.col("df") >= min_df)
    )
