"""Structured-Streaming front-end — client pushes as a live stream.

The reference's ``AddPages`` is a client-streamed gRPC RPC feeding a live
job (worker.go:219-269); frontier rounds are the engine's micro-batches
(SURVEY.md §2.7). Here the push stream is a Structured Streaming source
(JSON-lines files in a watched directory — swap for Kafka in production),
and ``foreachBatch`` folds each batch into the round loop:

    pushes stream → foreachBatch(batch):
        engine.add_pushes(batch)   # unnormalized, seen-exempt (job.go:696)
        engine.drain()             # rounds until all hosts idle

Exactly-once: the engine's per-round atomic commits + the streaming
checkpoint's batch offsets together make replays idempotent (a replayed
batch re-injects pushes at a round that is already committed; the commit
manifest wins). The crawl state itself lives in the engine checkpoint,
not in Spark streaming state stores — state survives a restart of the
query AND of the engine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ideacrawler_spark.plans.crawl import CrawlEngine

# built explicitly — StructType.fromDDL needs a live SparkContext at import
PUSH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("meta", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("no_callback", T.BooleanType()),
])


class StreamingCrawl:
    """Drive a CrawlEngine from a streaming push source."""

    def __init__(self, engine: CrawlEngine, push_dir: str,
                 checkpoint_dir: Optional[str] = None):
        self.engine = engine
        self.push_dir = push_dir
        self.ckpt = checkpoint_dir
        self.batches = 0

    def _handle_batch(self, batch_df, batch_id: int):
        rows = [r.asDict() for r in
                batch_df.orderBy("seq").collect()]  # batches are small by contract
        self.engine.add_pushes(rows)
        self.engine.drain()
        self.batches += 1

    def run_available(self) -> dict:
        """Process everything currently in the push directory (the
        Trigger.AvailableNow analogue), then return engine results."""
        spark: SparkSession = self.engine.spark
        self.engine._init_state()
        reader = (
            spark.readStream.schema(PUSH_SCHEMA)
            .option("maxFilesPerTrigger", 1)  # one push-file per micro-batch
            .json(self.push_dir)
        )
        writer = reader.writeStream.foreachBatch(self._handle_batch)
        if self.ckpt:
            writer = writer.option("checkpointLocation", self.ckpt)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        # final drain in case the last batch left future-round pushes
        self.engine.drain()
        return self.engine.results()
