"""Frontier-side URL quality filtering — blocklists and spam signals.

A 10^10-URL frontier spends real money on junk hosts; production crawls
gate admission on (a) a domain blocklist with SUFFIX semantics (blocking
``tracker.example`` must also block ``cdn.tracker.example``) and (b)
cheap per-URL spam signals (digit-heavy hosts, deep paths, parameter
explosions). Both are implemented scale-first:

- ``blocklist_filter``: the host explodes into its dot-suffixes
  (``a.b.c`` → ``a.b.c``, ``b.c``, ``c``) and equi-joins a BROADCAST
  blocklist dim — the standard shape for suffix matching at scale (one
  map-side explode bounded by label count, no shuffle of the frontier).
- ``url_signals``: pure map-side regexp projections (no shuffle).

All outputs are integers/booleans/strings so the DuckDB oracle can
re-derive them with the same RE2/Java-safe expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_suffixes(host_col):
    """'a.b.c' → ['a.b.c', 'b.c', 'c'] (dot-boundary suffixes)."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n - i + 1)),
    )


def blocklist_filter(df: DataFrame, blocklist: list,
                     host_col: str = "host") -> DataFrame:
    """Adds a ``blocked`` boolean: true iff any dot-suffix of the host is
    on the blocklist. The blocklist joins broadcast; the frontier never
    shuffles."""
    spark = df.sparkSession
    bl = spark.createDataFrame([(b,) for b in blocklist], "_bl_domain string")
    suf = df.withColumn("_suf", F.explode(host_suffixes(F.col(host_col))))
    hits = (
        suf.join(F.broadcast(bl), suf["_suf"] == bl["_bl_domain"])
        .select(F.col(host_col).alias("_bl_host")).distinct()
    )
    return df.join(
        F.broadcast(hits), df[host_col] == hits["_bl_host"], "left"
    ).withColumn("blocked", F.col("_bl_host").isNotNull()).drop("_bl_host")


def url_signals(df: DataFrame, url_col: str = "url",
                host_col: str = "host") -> DataFrame:
    """Adds integer spam signals: n_host_digits, path_depth, n_params."""
    host = F.col(host_col)
    url = F.col(url_col)
    n_host_digits = (
        F.length(host) - F.length(F.regexp_replace(host, "[0-9]", ""))
    ).cast("int")
    path = F.regexp_extract(url, r"^[a-z]+://[^/]+(/[^?#]*)", 1)
    path_depth = (F.size(F.split(path, "/")) - 1).cast("int")
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))).cast("int")
    return (
        df.withColumn("n_host_digits", n_host_digits)
        .withColumn("path_depth", path_depth)
        .withColumn("n_params", n_params)
    )
