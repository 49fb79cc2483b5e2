"""Frontier-side URL quality filtering — blocklists and spam signals.

A 10^10-URL frontier spends real money on junk hosts; production crawls
gate admission on (a) a domain blocklist with SUFFIX semantics (blocking
``tracker.example`` must also block ``cdn.tracker.example``) and (b)
cheap per-URL spam signals (digit-heavy hosts, deep paths, parameter
explosions). Both are implemented scale-first:

- ``blocklist_filter``: distinct HOSTS (not URLs) explode into their
  dot-suffixes (``a.b.c`` → ``a.b.c``, ``b.c``, ``c``) and equi-join the
  BROADCAST blocklist dim; the resulting blocked-host set joins back to
  the frontier BY HOST KEY with no broadcast hint (VERDICT r03 #5: only
  the true dim — the input blocklist — is assumed broadcast-small; a
  pathological frontier where most hosts are blocked degrades to a
  sort-merge join instead of overflowing a forced broadcast, and AQE
  still broadcasts at runtime when the set really is small). The
  host-keyed join co-partitions with the admission shuffle.
- ``url_signals``: pure map-side regexp projections (no shuffle).
- ``apply_url_gating``: the two composed behind JobSpec knobs — the
  CrawlEngine admission hook.

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
    on the blocklist.

    Only the input blocklist carries a broadcast hint (it is a true dim).
    The blocked-host set is frontier-derived and joins back keyed on
    host — never force-broadcast (its size is data-dependent); Catalyst/
    AQE broadcast it when stats allow, else it sort-merges, co-partitioned
    with the admission shuffle's host key."""
    spark = df.sparkSession
    bl = spark.createDataFrame([(b,) for b in blocklist], "_bl_domain string")
    hosts = df.select(F.col(host_col).alias("_bl_host")).distinct()
    hits = (
        hosts.withColumn("_suf", F.explode(host_suffixes(F.col("_bl_host"))))
        .join(F.broadcast(bl), F.col("_suf") == F.col("_bl_domain"))
        .select("_bl_host").distinct()
        .withColumn("_bl_hit", F.lit(True))
    )
    return (
        df.join(hits, df[host_col] == hits["_bl_host"], "left")
        .withColumn("blocked", F.coalesce(F.col("_bl_hit"), F.lit(False)))
        .drop("_bl_host", "_bl_hit")
    )


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


def apply_url_gating(df: DataFrame, spec, url_col: str = "url_norm",
                     host_col: str = "host") -> DataFrame:
    """Adds ``_url_blocked`` per the JobSpec gating knobs (config.py):
    suffix blocklist OR any spam signal above its threshold. The caller
    filters/counts; columns added here are internal and dropped by
    ``drop_gating_cols``."""
    out = df
    if spec.host_blocklist:
        out = blocklist_filter(out, list(spec.host_blocklist),
                               host_col=host_col)
    else:
        out = out.withColumn("blocked", F.lit(False))
    out = url_signals(out, url_col=url_col, host_col=host_col)
    bad = F.col("blocked")
    if spec.max_host_digits is not None:
        bad = bad | (F.col("n_host_digits") > F.lit(int(spec.max_host_digits)))
    if spec.max_path_depth is not None:
        bad = bad | (F.col("path_depth") > F.lit(int(spec.max_path_depth)))
    if spec.max_query_params is not None:
        bad = bad | (F.col("n_params") > F.lit(int(spec.max_query_params)))
    return out.withColumn("_url_blocked", bad)


GATING_COLS = ("blocked", "n_host_digits", "path_depth", "n_params",
               "_url_blocked")


def drop_gating_cols(df: DataFrame) -> DataFrame:
    return df.drop(*GATING_COLS)


def url_templates(df: DataFrame, min_urls: int = 2,
                  url_col: str = "url",
                  host_col: str = "host") -> DataFrame:
    """Crawler-trap / template mining: collapse every digit run in the
    URL to ``N`` and count URLs per resulting pattern. Calendar traps,
    session-id explosions and infinite pagination all surface as one
    pattern with a huge ``n_urls`` — the standard pre-filter before
    per-URL gating (a pattern-level block is one row; the URLs it
    covers can be millions).

    Returns (pattern, n_urls, n_hosts) for patterns with at least
    ``min_urls`` URLs. Scale shape: one map-side regexp projection and
    ONE partial-aggregated groupBy(pattern); the hot pattern collapses
    to a row per map task before the exchange (count + distinct-host
    partial aggs).
    """
    return (
        df.select(
            F.regexp_replace(F.col(url_col), r"\d+", "N").alias("pattern"),
            F.col(host_col).alias("_h"),
        )
        .groupBy("pattern")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("_h").cast("long").alias("n_hosts"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )
