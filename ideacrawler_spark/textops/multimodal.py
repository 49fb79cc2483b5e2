"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested; the actual media decoding is STUBBED with a
deterministic fake because no image/audio libraries ship in this sandbox
(clearly marked below — swap ``_fake_decode`` for PIL/soundfile on a real
cluster).

Pattern: ``mapInPandas`` over an iterator of Arrow batches so one task
never materializes more than one batch of binary payloads — the shape that
survives 100 TB of media. Metadata travels in typed columns next to the
payload, so partition pruning and predicate pushdown still work on it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)
FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum long, "
    "feat array<float>"
)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """STUB: deterministic stand-in for a real decoder (PIL/librosa/ffmpeg
    are not installed here). Produces an 8-dim float feature from payload
    bytes — stable, so tests can assert exact values."""
    if payload is None:
        payload = b""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(8, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float32), 8)
    return np.array([c.mean() if c.size else 0.0 for c in chunks],
                    dtype=np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        int(np.frombuffer(p or b"", dtype=np.uint8).sum())
                        for p in pdf["payload"]
                    ],
                    "feat": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, out_w int, out_h int, "
    "payload binary"
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image-resize plumbing: aspect-preserving target dims computed
    JVM-side; the pixel work is a STUB (no image lib here — swap the
    body of ``batches`` for PIL's ``Image.resize`` in production). The
    payload passes through untouched so byte-accounting stays testable."""
    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload",
        F.least(F.col("width"), F.lit(max_side)).alias("out_w"),
        (F.col("height") * F.least(F.col("width"), F.lit(max_side))
         / F.col("width")).cast("int").alias("out_h"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # STUB: real impl decodes + resamples; plumbing keeps payload
            yield pdf[["media_id", "width", "height", "out_w", "out_h",
                       "payload"]]

    return imgs.mapInPandas(batches, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp.
    The decode is stubbed; the explode/partitioning shape is real."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )
    )


def synth_media(spark, n: int = 64):
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 37 + j * 11) % 251) for j in range((i % 7 + 1) * 32))
        rows.append(
            dict(
                media_id=i, kind=kind, payload=payload,
                mime={"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                width=64 + i % 128 if kind == "image" else None,
                height=64 + i % 64 if kind == "image" else None,
                duration_ms=(i % 10 + 1) * 500 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
