"""Hashed-feature linear text classification (fastText-inference shape).

The third quality-filtering family a curation pipeline runs alongside
heuristics (``analysis.quality``) and LM scores (``lm_surprisal``): a
linear classifier over hashed bag-of-words features — the inference
shape of fastText/logistic quality models (CCNet, RefinedWeb, FineWeb
all gate on one). Training happens offline; here the model IS a
(bucket, weight) table, and scoring is:

    score(doc) = sum over tokens of W[h(token) mod n_buckets]

in exact integer arithmetic (weights are integers, ties at 0 are
deterministic), so the DuckDB oracle re-derives every score.

Scale shape: tokenize + bucket-hash are map-side; the weight table is a
true dim (n_buckets rows, explicitly broadcast); the per-doc score is
ONE partial-aggregated groupBy(doc_id). A 100-TB corpus streams through
a single shuffle keyed on doc_id.
"""

from pyspark.sql import DataFrame, functions as F

from ideacrawler_spark.textops.dedup import words_col
from ideacrawler_spark.textops.hashing import h60

N_BUCKETS = 4096
# synthetic-but-fixed "trained" weights: w(b) = (h60('w'||b) mod 2001)
# - 1000, an integer in [-1000, 1000] — deterministic in both engines.
WEIGHT_SPAN = 2001
WEIGHT_SHIFT = 1000


def weight_table(spark, n_buckets: int = N_BUCKETS) -> DataFrame:
    """The model dim: (bucket, w) with the fixed synthetic weights."""
    b = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    return b.select(
        "bucket",
        ((h60(F.concat(F.lit("w"), F.col("bucket").cast("string")))
          % WEIGHT_SPAN) - WEIGHT_SHIFT).cast("long").alias("w"),
    )


def classifier_score(docs: DataFrame, weights: DataFrame = None,
                     n_buckets: int = N_BUCKETS,
                     text_col: str = "text") -> DataFrame:
    """(doc_id, score, keep) — the linear quality score and the gate
    decision (keep = score > 0). ``weights`` defaults to the fixed
    synthetic model; pass a real exported (bucket, w) table in
    production."""
    if weights is None:
        weights = weight_table(docs.sparkSession, n_buckets)
    feats = docs.select(
        "doc_id",
        F.explode(words_col(text_col)).alias("tok"),
    ).select(
        "doc_id",
        (h60(F.col("tok")) % n_buckets).cast("int").alias("bucket"),
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("score"))
        .select(
            "doc_id", "score",
            (F.col("score") > 0).alias("keep"),
        )
    )
