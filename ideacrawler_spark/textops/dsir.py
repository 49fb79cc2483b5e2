"""DSIR-style data selection with importance resampling.

DSIR (Xie et al. 2023, arXiv:2302.03169) selects pretraining documents
whose hashed n-gram feature distribution looks like a TARGET corpus
rather than the RAW crawl: estimate bucketed feature distributions for
both, score every document by its importance weight under the ratio, and
keep the top-scoring slice. It is the standard pipeline step between
dedup and tokenization, and the reference crawler has nothing like it —
this is training-data-pipeline surface on top of the crawl.

Adaptation for engine-exact verification: the published method scores
log(p_target/p_raw) in floats; here the per-bucket weight is the integer
ratio div(SCALE*(t_b+1), (r_b+1)) (add-one smoothing) and a document's
score is the sum of its word-occurrence weights — same ordering
intuition, exact int64 arithmetic, so the DuckDB oracle verifies values.

Scale shape: one explode over words (the same map-side shape as minhash
shingling), two partial-agg counts into a <= n_buckets-row weight table
(4096 rows — broadcast), one broadcast join back, one per-doc sum with
map-side combine. The top-n selection uses global_rank (range-partitioned
rank), never a single-partition window over all docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ideacrawler_spark.operators.rank import global_rank
from ideacrawler_spark.textops.dedup import words_col
from ideacrawler_spark.textops.hashing import h60

N_BUCKETS = 4096
W_SCALE = 1_000_000


def dsir_select(docs: DataFrame, target_lang: str = "en",
                n_buckets: int = N_BUCKETS, scale: int = W_SCALE,
                n_keep: int = 100) -> DataFrame:
    """(doc_id, score, selected): integer DSIR importance scores against
    the in-corpus target slice ``lang == target_lang``, with the top
    ``n_keep`` docs (ties broken by doc_id) flagged selected.

    In production the target distribution comes from a separate
    high-quality corpus (Wikipedia/books); here the target slice is
    defined inside the same table so the oracle sees identical inputs —
    the plan shape is the same either way (the target count is just a
    second aggregation, of whatever frame plays the target)."""
    # persisted: the weight estimation AND the scoring join both read the
    # bucketed word stream — without the persist each reference re-ran the
    # explode + portable-hash pass over the whole corpus (and the raw/
    # target distributions, previously two aggregations + a join, fold
    # into ONE conditional aggregate — one exchange of <= n_buckets
    # partial rows instead of two plus a join)
    buckets = docs.select(
        "doc_id", "lang", F.explode(words_col()).alias("w")
    ).select("doc_id", "lang", (h60(F.col("w")) % n_buckets).alias("b")) \
        .persist()
    weights = (
        buckets.groupBy("b")
        .agg(
            F.count("*").alias("r"),
            F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0))
            .alias("t"),
        )
        .select(
            "b",
            F.expr(f"div({scale} * (coalesce(t, 0) + 1), r + 1)").alias("wb"),
        )
    )
    scores = (
        buckets.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.sum("wb").cast("long").alias("score"))
    )
    ranked = global_rank(
        scores.withColumn("_neg", -F.col("score")),
        ["_neg", "doc_id"], out_col="_rk", small_hint=None,
    )
    return ranked.select(
        "doc_id", "score",
        (F.col("_rk") < n_keep).cast("int").alias("selected"),
    )
