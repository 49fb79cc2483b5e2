"""Custom stateful streaming operator — per-host budget enforcement with
``applyInPandasWithState``.

The batch engine realizes IdeaCrawler's per-host politeness as per-round
budget admission (operators/admission.py). This module is the STREAMING
form of the same rule: a frontier stream grouped by host where each host
carries persistent state across micro-batches — total admitted so far and
the rolling budget — so a host that exhausted its allowance in batch N
stays throttled in batch N+1 without any external store. This is the
``applyInPandasWithState`` pattern the engine would use for any custom
stateful operator a real deployment needs (session windows, per-host
backoff, adaptive crawl-delay).

Semantics (deterministic given a deterministic batch order, e.g.
``maxFilesPerTrigger=1`` + AvailableNow):

- per host, rows are admitted in (depth, seq) order;
- each micro-batch grants the host ``budget_per_batch`` new tokens,
  accumulated up to ``max_tokens`` (a token bucket: idle hosts can burst
  later, exactly like a crawler that fell behind on a polite host);
- rows beyond the available tokens are DROPPED from the stream output
  (the batch engine carries them; a stream re-offers them next batch at
  the source level).

Output rows carry ``admit_seq`` — the host's running admitted counter —
so downstream sinks see a gap-free per-host sequence across batches.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

ADMITTED_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("seq", T.LongType()),
    T.StructField("admit_seq", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("admitted_total", T.LongType()),
    T.StructField("tokens", T.LongType()),
])


def host_rate_limiter(budget_per_batch: int, max_tokens: int):
    """Build the applyInPandasWithState function for the given budgets."""

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            admitted_total, tokens = state.get
        else:
            admitted_total, tokens = 0, 0
        tokens = min(int(tokens) + budget_per_batch, max_tokens)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["depth", "seq"], kind="mergesort")
        take = min(int(tokens), len(rows))
        out = rows.iloc[:take].copy()
        out["admit_seq"] = range(int(admitted_total),
                                 int(admitted_total) + take)
        out["host"] = host
        tokens -= take
        admitted_total += take
        state.update((int(admitted_total), int(tokens)))
        yield out[["host", "url", "depth", "seq", "admit_seq"]]

    return fn


def rate_limited_stream(frontier_stream: DataFrame,
                        budget_per_batch: int = 5,
                        max_tokens: int = 10) -> DataFrame:
    """frontier stream (host, url, depth, seq) → admitted stream with a
    persistent per-host token bucket."""
    return (
        frontier_stream.groupBy("host")
        .applyInPandasWithState(
            host_rate_limiter(budget_per_batch, max_tokens),
            outputStructType=ADMITTED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
