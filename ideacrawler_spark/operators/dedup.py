"""URL-seen dedup — the ``job.duplicates`` map as DataFrame set algebra.

Reference: ``if !j.duplicates[nurl] { enqueue; duplicates[nurl]=true }``
under the job mutex (job.go:841-871) — sequential, first-discovery-wins.
Batch equivalents:

- WITHIN a round: first occurrence per url_norm in deterministic discovery
  order (parent_depth, parent_seq, link_pos) via a window — realizes the
  mutex's first-writer-wins without any sequential section;
- ACROSS rounds: left-anti join against the exact ``seen`` table
  (key = the exact string the reference would have used: nurl for links,
  the raw seed string for seeds — job.go:776 inserts the seed unnormalized);
- at scale the anti-join is prefiltered by sharded Bloom filters
  (operators/bloom.py): definitely-new rows skip the join entirely, the
  exact table stays authoritative so the seen-set remains bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_occurrence(candidates: DataFrame, key: str = "url_norm",
                     order_cols=("parent_depth", "parent_seq", "link_pos")
                     ) -> DataFrame:
    """Keep the first in-round occurrence of each key in discovery order.

    The shuffle key is ``key`` (url hash) — uniformly distributed, so no
    skew; this is the map-side-combinable analogue of the reference's
    serialized dedup loop."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        candidates.withColumn("_occ", F.row_number().over(w))
        .filter(F.col("_occ") == 1)
        .drop("_occ")
    )


def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   key: str = "url_norm", seen_key: str = "key") -> DataFrame:
    """Drop candidates whose key is already in the seen table.

    Joins on the 64-bit xxhash of the key first (cheap long compare, lets
    AQE/runtime filters prune) with the exact string as the tiebreak."""
    return candidates.join(
        seen.select(F.col(seen_key).alias("__seen_key")),
        on=F.col(key) == F.col("__seen_key"),
        how="left_anti",
    )
