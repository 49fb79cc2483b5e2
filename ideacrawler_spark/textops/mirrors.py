"""Mirror-site detection: host pairs sharing many identical content
fingerprints.

Large crawls are full of mirrors (country TLD twins, CDN vanity hosts,
scraped re-posts); detecting them at the HOST level lets curation drop
whole duplicate sites before any per-document near-dup pass runs.

Algorithm (bucket-capped, like the LSH pair generation in
textops/similarity.py):
1. distinct (host, content_key) — one row per host per fingerprint;
2. per content_key, the sorted host list capped at ``host_cap`` (a
   fingerprint shared by H hosts would otherwise emit C(H,2) pairs —
   boilerplate keys like an empty page are exactly the H that explodes);
3. pairs expanded ARRAY-SIDE with a nested transform (no self-join
   shuffle: the cap bounds every array, so C(cap,2) structs per key);
4. one groupBy (host_a, host_b) counting shared keys, filtered at
   ``min_shared``.

Scale shape: two shuffles total (distinct, pair count), both on bounded
rows; no all-pairs host join anywhere. Every step is built-in column
functions — no Python UDF.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mirror_host_pairs(rows: DataFrame, host_col: str = "host",
                      key_col: str = "content_key", host_cap: int = 16,
                      min_shared: int = 2) -> DataFrame:
    """(host_a, host_b, n_shared) with host_a < host_b, n_shared =
    number of distinct content keys both hosts carry (after the per-key
    host cap; keys on >host_cap hosts contribute their first host_cap
    hosts in sorted order — deterministic and bounded)."""
    hosts_per_key = (
        rows.select(F.col(host_col).alias("h"), F.col(key_col).alias("k"))
        .distinct()
        .groupBy("k")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, host_cap)
             .alias("hs"))
        .filter(F.size("hs") >= 2)
    )
    pairs = hosts_per_key.select(
        F.explode(
            F.flatten(
                F.transform(
                    "hs",
                    lambda x, i: F.transform(
                        F.slice("hs", i + 2, F.size("hs")),
                        lambda y: F.struct(x.alias("host_a"),
                                           y.alias("host_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.host_a").alias("host_a"),
                      F.col("p.host_b").alias("host_b"))
        .agg(F.count("*").cast("int").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
