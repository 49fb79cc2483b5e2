"""Watermarked windowed aggregation over an event stream.

The reference has no late-data semantics (live HTTP only, SURVEY §2.7);
this module supplies the Structured-Streaming side of the engine's metrics
story: per-window lineage counts computed over a stream with a watermark,
so late events are handled deterministically — the batch `q_events_hourly`
oracle query is the same aggregation in batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_event_counts_stream(spark: SparkSession, events_dir: str,
                                 watermark: str = "1 hour",
                                 window: str = "1 hour") -> DataFrame:
    """readStream → watermark → tumbling-window counts (append-ready)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def run_available_to_memory(spark: SparkSession, events_dir: str,
                            name: str = "windowed_counts") -> DataFrame:
    """Execute with Trigger.AvailableNow into a memory sink; returns the
    result table. Complete output mode: every window emitted once the
    stream drains."""
    q = (
        windowed_event_counts_stream(spark, events_dir)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
