"""Sequence packing and chunking for LLM training contexts.

The last hop of a curation pipeline turns documents into fixed-length
training contexts. Two standard shapes:

- ``pack_sequences`` — GPT-style concat-and-chunk: lay every document's
  tokens end to end in doc_id order and cut the stream into ``ctx_len``
  windows. The interesting part at 100 TB is the GLOBAL running token
  offset: the naive expression is a window over an empty partition spec,
  which Spark executes as a single-partition sort — a scale killer. This
  module computes it as a distributed two-phase prefix sum instead:
  range-partition by doc_id, a per-partition (bounded, N/P-row) local
  cumulative sum, and a second cumulative sum over the PER-PARTITION
  TOTALS — a dataframe with one row per partition, where a
  single-partition window is exactly right — broadcast-joined back.
  The result is invariant to where the sampled range boundaries land,
  because any boundary placement yields the same global prefix sum.

- ``chunk_documents`` — per-document sliding windows with overlap
  (RAG / long-doc SFT shape): stride = chunk - overlap, windows start at
  0, stride, 2*stride, ... while they still introduce new tokens. Pure
  map-side explode over array slices — no shuffle at any scale.

Tokens are the single-space word split (``words_col``) shared by every
textops operator, so counts agree with token_count/lm_surprisal and the
DuckDB oracle re-derives everything with integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ideacrawler_spark.textops.dedup import words_col


def token_offsets(docs: DataFrame, text_col: str = "text",
                  num_range_parts: int = 32) -> DataFrame:
    """(doc_id, n_tok, cum, tok_start, pid): the global token offset of
    every document in doc_id order, via the distributed two-phase prefix
    sum described in the module docstring — the only empty-partition
    window runs over ``num_range_parts`` per-partition totals, never the
    data. Shared by pack_sequences and shard_plan."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(words_col(text_col)).cast("long").alias("n_tok"),
    )
    binned = toks.repartitionByRange(num_range_parts, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = binned.withColumn("lcum", F.sum("n_tok").over(w_local))
    # one row per range partition; the empty-partition-spec window is
    # bounded by num_range_parts rows, so single-partition is correct
    totals = binned.groupBy("pid").agg(F.sum("n_tok").alias("ptot"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.withColumn(
        "off", F.coalesce(F.sum("ptot").over(w_off), F.lit(0).cast("long"))
    )
    return (
        local.join(F.broadcast(offs.select("pid", "off")), "pid")
        .withColumn("cum", F.col("lcum") + F.col("off"))
        .withColumn("tok_start", F.col("cum") - F.col("n_tok"))
    )


def shard_plan(docs: DataFrame, shard_tokens: int = 4096,
               text_col: str = "text",
               num_range_parts: int = 32) -> DataFrame:
    """Output-writer planning: assign documents (in doc_id order) to
    fixed-token-budget output shards — shard = tok_start div
    ``shard_tokens``, i.e. each doc goes to the shard where its first
    token lands, so every shard holds ~shard_tokens tokens give or take
    one document. Returns per-shard stats (shard, n_docs, n_tokens,
    first_doc, last_doc) — the manifest a parallel writer consumes.

    Same two-phase prefix sum as pack_sequences (no corpus-sized
    window); the final aggregation is one partial-agg groupBy(shard)."""
    g = token_offsets(docs, text_col, num_range_parts)
    t = F.lit(int(shard_tokens)).cast("long")
    return (
        g.withColumn("shard", F.floor(F.col("tok_start") / t))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 1024,
    text_col: str = "text",
    num_range_parts: int = 32,
) -> DataFrame:
    """Pack the corpus token stream (doc_id order) into ``ctx_len``-token
    training contexts.

    Returns one row per context chunk: (chunk_id, n_docs, n_tokens,
    first_doc, last_doc) — n_docs counts documents CONTRIBUTING tokens to
    the chunk (a long document spans several chunks and counts in each),
    n_tokens == ctx_len everywhere except the final partial chunk. All
    columns are integers.

    Scale shape: the global token offset is a two-phase prefix sum (see
    module docstring) — the only empty-partition-spec window runs over
    the per-partition totals (``num_range_parts`` rows), never the data.
    The chunk assignment is a map-side explode of each doc's
    [first_chunk, last_chunk] span followed by one hash aggregation on
    chunk_id.
    """
    g = token_offsets(docs, text_col, num_range_parts)
    ctx = F.lit(int(ctx_len)).cast("long")
    # n_tok >= 1 always (a single-space split yields at least one token),
    # so cum-1 >= tok_start and the sequence never runs backwards
    spans = g.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / ctx),
                F.floor((F.col("cum") - 1) / ctx),
            )
        ),
    )
    in_chunk = F.least(F.col("cum"), (F.col("chunk_id") + 1) * ctx) - F.greatest(
        F.col("tok_start"), F.col("chunk_id") * ctx
    )
    return (
        spans.groupBy("chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(in_chunk).cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select("chunk_id", "n_docs", "n_tokens", "first_doc", "last_doc")
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int = 128,
    overlap: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding token windows: stride ``chunk - overlap``,
    windows start while start < n_tok (every token appears in at least
    one window; the last window may be short). Returns (doc_id,
    chunk_idx, chunk_start, chunk_tokens, chunk_text) — chunk_tokens is
    the window's actual token count, chunk_text the space-joined window.

    Map-side only: one explode over a per-row integer sequence and array
    slices — no shuffle, evaluated inside the scan's codegen pipeline.
    """
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap
    w = words_col(text_col)
    n = F.size(w).cast("long")
    n_starts = F.floor((n - 1) / F.lit(stride)) + 1  # ceil(n / stride)
    exploded = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        w.alias("_w"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_starts - 1)
        ).alias("chunk_idx"),
    ).withColumn("chunk_start", F.col("chunk_idx") * F.lit(stride))
    piece = F.slice(F.col("_w"), F.col("chunk_start") + 1, chunk)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size(piece).cast("long").alias("chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
