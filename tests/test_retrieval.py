"""Unit tests for inverted-index retrieval (textops/retrieval.py):
hand-computed integer tf-idf-surrogate scores, tiebreak order, and the
postings index contents."""

from ideacrawler_spark.textops.retrieval import (
    term_retrieval,
    term_tf,
    token_postings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_tf_counts_only_query_terms(spark):
    docs = _docs(spark, [(1, "x x y"), (2, "x z")])
    got = {(r["doc_id"], r["tok"]): r["tf"]
           for r in term_tf(docs, ["x", "z"]).collect()}
    assert got == {(1, "x"): 2, (2, "x"): 1, (2, "z"): 1}


def test_term_retrieval_scores_and_tiebreak(spark):
    """N=3, df(x)=2, df(z)=2 → idf = 3 div 2 = 1.
    d3: tf(z)=3 → score 3; d1: tf(x)=2 → 2; d2: 1+1 → 2.
    d1 vs d2 tie on score breaks on doc_id ascending."""
    docs = _docs(spark, [(1, "x x y"), (2, "x z"), (3, "z z z w")])
    got = [(r["doc_id"], r["score"], r["n_terms"])
           for r in term_retrieval(docs, ["x", "z"], k=10).collect()]
    assert got == [(3, 3, 1), (1, 2, 1), (2, 2, 2)]


def test_term_retrieval_k_truncates(spark):
    docs = _docs(spark, [(i, "x") for i in range(1, 6)])
    got = [r["doc_id"] for r in term_retrieval(docs, ["x"], k=2).collect()]
    assert got == [1, 2]  # equal scores → doc_id order, capped at k


def test_token_postings_sorted_and_min_df(spark):
    docs = _docs(spark, [(3, "x y"), (1, "x"), (2, "x y x")])
    got = {r["tok"]: (r["df"], r["postings_csv"])
           for r in token_postings(docs, min_df=2).collect()}
    # per-doc DISTINCT: duplicate x in doc 2 counts once; y df=2
    assert got == {"x": (3, "1,2,3"), "y": (2, "2,3")}


def test_token_postings_max_df_drops_stopwords(spark):
    docs = _docs(spark, [(1, "the x"), (2, "the y"), (3, "the x z")])
    got = {r["tok"] for r in token_postings(
        docs, min_df=2, max_df=2).collect()}
    assert got == {"x"}  # 'the' (df=3) over max_df; y/z hapax


# --- SemDeDup --------------------------------------------------------------

def _semdedup_frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_drops_planted_duplicates(spark):
    from ideacrawler_spark.textops.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid 1
        (2, [0.9, 0.1, 0.0, 0.0]),   # near v0: cos ~ 0.994 -> dropped
        (3, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to both -> kept
        (4, [-1.0, 0.0, 0.0, 0.0]),  # negated v0: cos = -1 -> kept
        (5, [0.5, 0.0, 0.0, 0.0]),   # scaled v0: cos = 1 -> dropped
    ]
    out = {r["vec_id"]: r for r in
           semdedup(_semdedup_frame(spark, rows), n_cells=2).collect()}
    assert out[0]["kept"] == 1 and out[0]["dup_of"] == -1
    assert out[2]["kept"] == 0 and out[2]["dup_of"] == 0
    assert out[3]["kept"] == 1
    assert out[4]["kept"] == 1  # anti-parallel fails the d > 0 gate
    assert out[5]["kept"] == 0 and out[5]["dup_of"] == 0


def test_semdedup_cell_cap_bounds_the_rep_set(spark):
    from ideacrawler_spark.textops.similarity import semdedup

    # v3 duplicates v2, but with cell_cap=2 only {v0, v1-ish} members rank
    # as reps; v2 is rank 3 in its cell, so v3 survives: the cap is a
    # documented approximation bound, mirrored by the oracle.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.05, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.7, 0.7]),
        (3, [0.0, 0.0, 0.7, 0.7]),
    ]
    # one cell (n_cells=1): reps by id order = v0, v1 under cap=2
    out = {r["vec_id"]: r for r in
           semdedup(_semdedup_frame(spark, rows), n_cells=1,
                    cell_cap=2).collect()}
    assert out[1]["kept"] == 0 and out[1]["dup_of"] == 0
    assert out[3]["kept"] == 1  # its duplicate v2 is beyond the rep cap
