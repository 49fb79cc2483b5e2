"""Deterministic sampling for training-data mixes.

A 100 TB curation pipeline ends in a MIX: keep p_s of stratum s (per
language, per source, per quality bucket). Random sampling is
non-reproducible across runs and engines; these operators sample by
PORTABLE HASH instead — keep a row iff h60(key) % den < num for its
stratum — so the same row set is selected on every run, on Spark and on
the DuckDB oracle, and joins/unions of samples stay consistent (a doc
sampled into one mix is sampled identically into another).

Everything is a map-side filter: no shuffle anywhere, evaluated inside
the scan's whole-stage-codegen pipeline (the md5-based predicate itself
is not a parquet-pushable filter, but column pruning still reaches the
scan and the sample never exchanges), and rates compose as exact
integer fractions (no float thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ideacrawler_spark.textops.hashing import h60


def hash_bucket(key_col: Column, den: int) -> Column:
    """Deterministic bucket in [0, den) from the portable h60 hash."""
    return h60(key_col.cast("string")) % F.lit(den)


def stratified_sample(
    df: DataFrame,
    rates: dict,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: tuple = (0, 1),
) -> DataFrame:
    """Keep each row iff h60(key) % den < num for its stratum's
    (num, den) rate; strata absent from ``rates`` use ``default_rate``.

    The filter is a single map-side predicate (chained whens over the
    small strata dict — broadcast-free); at 100 TB the sample never
    shuffles."""
    num = F.lit(int(default_rate[0]))
    den = F.lit(int(default_rate[1]))
    for stratum, (n, d) in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        num = F.when(cond, F.lit(int(n))).otherwise(num)
        den = F.when(cond, F.lit(int(d))).otherwise(den)
    bucket = h60(F.col(key_col).cast("string")) % den
    return df.filter(bucket < num)


def per_source_cap(docs: DataFrame, cap: int, salt: int = 16,
                   source_col: str = "source",
                   order_col: str = "doc_id") -> DataFrame:
    """Keep at most ``cap`` docs per source (lowest ``order_col`` first) —
    the max-N-docs-per-domain curation rule (C4/RefinedWeb-style domain
    balancing), with the same skew discipline as frontier admission
    (operators/admission.py): a viral source with 10^8 docs must not
    funnel through ONE window-sort task.

    Salted two-phase top-k: phase 1 ranks within (source, salt-of-key) —
    ``salt`` parallel slices per source — and keeps each slice's top
    ``cap``, which provably contains the true per-source top ``cap``;
    phase 2 ranks only those ≤ salt×cap survivors. The literal ``cap``
    bound lets Catalyst insert WindowGroupLimit (bounded heap before the
    exchange, no full partition sort). Adds ``src_rank`` (1-based)."""
    salted = docs.withColumn(
        "_salt", h60(F.col(order_col).cast("string")) % F.lit(salt)
    )
    w1 = Window.partitionBy(source_col, "_salt").orderBy(order_col)
    p1 = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= cap)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(source_col).orderBy(order_col)
    return (
        p1.withColumn("src_rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("src_rank") <= cap)
    )


def weighted_mix(parts: dict, key_col: str = "doc_id") -> DataFrame:
    """Union of independently hash-sampled sources: ``parts`` maps a
    source label to (DataFrame, (num, den)). Each source is sampled by
    the same portable-hash rule, tagged with its label, and unioned —
    the deterministic analogue of a weighted training-data mixture."""
    out = None
    for label, (df, (n, d)) in sorted(parts.items()):
        bucket = h60(F.col(key_col).cast("string")) % F.lit(int(d))
        sampled = df.filter(bucket < F.lit(int(n))).withColumn(
            "mix_source", F.lit(label))
        out = sampled if out is None else out.unionByName(sampled)
    return out
