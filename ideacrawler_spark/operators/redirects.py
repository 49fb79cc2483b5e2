"""Redirect-chain resolution: terminal URL per source via pointer doubling.

The reference delegates redirect following to Go's http.Client inside a
single fetch (per-request, in-process). A Common-Crawl-scale pipeline
instead holds redirects as DATA — (url, status 3xx, Location) rows
harvested across the whole crawl — and must resolve every chain to its
terminal URL to alias the seen-set and merge page signals. That is a
distributed iterative problem, solved here with pointer doubling
(log2(max_hops) self-joins), the same convergence shape as
textops.dedup.dedup_components.

Semantics (matched exactly by a recursive-CTE oracle):
- input ``edges``: (src, dst) — src issued a redirect to dst, one row per
  src (a URL has at most one Location; duplicate srcs are first-wins by
  min dst for determinism).
- output: (src, final_url, hops, looped) where final_url = the node
  reached after following at most ``max_hops`` edges, hops = edges
  actually followed, looped = final_url still has an outgoing edge
  (i.e. the chain did not terminate within the budget — a cycle or an
  over-long chain; browsers cap at ~20).

max_hops must be a power of two: after k doubling rounds every pointer
has advanced exactly min(2^k, distance-to-terminal) edges, which equals
the recursive oracle's "follow until terminal or hops = max_hops".

Scale shape: log2(max_hops) hash joins on the current-pointer key, each
preceded by a map-side projection — no windows, no driver collect, no
unbounded iteration. At 10^10 URLs with max_hops=16 that is 4 shuffles
over the (small) redirect-edge subset, not the full frontier.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 16,
                      src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(src, final_url, hops, looped) — see module docstring."""
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError("max_hops must be a power of two")

    # one edge per src (min dst = deterministic first-wins)
    e = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(F.col(dst_col)).alias("dst"))
    )

    # jump(u) = (node after min(2^k, dist) steps, that many hops)
    jump = e.select("src", F.col("dst").alias("cur"),
                    F.lit(1).cast("int").alias("hops"))
    rounds = max_hops.bit_length() - 1  # log2(max_hops)
    for _ in range(rounds):
        j2 = jump.select(
            F.col("src").alias("j_src"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        jump = (
            jump.join(j2, jump["cur"] == j2["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias("hops"),
            )
        )

    has_out = e.select(F.col("src").alias("cur"),
                       F.lit(True).alias("_more"))
    return (
        jump.join(has_out, "cur", "left")
        .select(
            "src",
            F.col("cur").alias("final_url"),
            F.col("hops").cast("int").alias("hops"),
            F.coalesce("_more", F.lit(False)).alias("looped"),
        )
    )
