"""Cross-engine deterministic hashing.

``h60(expr)`` = the first 15 hex digits of md5 as a non-negative 60-bit
integer. Identical in:

- Spark SQL:  CAST(conv(substring(md5(CAST(x AS BINARY)),1,15),16,10) AS BIGINT)
- DuckDB:     ('0x' || substring(md5(x),1,15))::BIGINT

Used for minhash/simhash/fingerprints so the correctness oracle can verify
values, not just row counts. Spark's own xxhash64 stays the engine-internal
key for the crawl frontier (faster, vectorized) — h60 is the *portable*
hash for oracle-checked operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2147483647  # 2^31-1, prime modulus for affine minhash permutations

# fixed permutation constants (a_j, b_j) — shared with the DuckDB oracle
MINHASH_A = [761, 1409, 2693, 4001, 5381, 7919, 9613, 11171]
MINHASH_B = [127, 331, 709, 1049, 1511, 2003, 2459, 2897]


def h60(col: Column) -> Column:
    """60-bit md5-derived integer of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """The same hash as DuckDB SQL text."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def h60_mod(col: Column, mod: int = P31) -> Column:
    return h60(col) % F.lit(mod)


def h60_mod_sql(expr: str, mod: int = P31) -> str:
    return f"({h60_sql(expr)} % {mod})"
