"""Training-data pipeline operators over the documents/embeddings tables.

Everything here is engine-portable by construction: the only hash function
is a 60-bit integer derived from md5 (computable identically in Spark SQL
and ANSI/DuckDB SQL), and similarity math is integer-quantized so that the
DuckDB oracle matches bit-for-bit (no cross-engine float-summation-order
hazards). At production scale the quantization is also a standard ANN trick
(int8/int16 quantized vectors).
"""

from ideacrawler_spark.textops.hashing import h60, h60_mod  # noqa: F401
