"""Common-Crawl CDX(J) index: SURT keys, line writer, line parser, lookup.

Common Crawl distributes its URL index as CDXJ files: one line per
capture, `<SURT key> <14-digit timestamp> <JSON payload>`, sorted by key
so a prefix scan answers "every capture under this host/path". A crawler
at CC scale consumes this index to seed/diff frontiers (the reference's
single-node analogue is its in-memory seen map, fetcher.go — there is no
index interchange format there; this is the at-scale surface).

SURT (Sort-friendly URI Reordering Transform), as implemented here and
mirrored exactly by the DuckDB oracle:

  - scheme and fragment dropped;
  - host lowercased, a leading ``www.`` stripped, labels reversed and
    comma-joined (``cdn.example.org`` -> ``org,example,cdn``);
  - an explicit non-default port kept (``:80`` dropped), appended to the
    reversed host;
  - ``)`` then the path, lowercased, ``/`` if empty;
  - query params sorted bytewise and re-joined (``?b=2&a=1`` -> ``?a=1&b=2``).

The SURT transform is pure built-in column algebra (split / reverse /
array_join / array_sort) — whole-stage-codegen, no Python. Only the CDXJ
LINE PARSER is Python (JSON payload), and it runs as mapInPandas over
Arrow batches like the WARC parser.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CDX_SCHEMA = StructType(
    [
        StructField("surt", StringType()),
        StructField("ts", LongType()),
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("mime", StringType()),
        StructField("digest", StringType()),
        StructField("length", LongType()),
    ]
)


def surt_col(url: Column) -> Column:
    """SURT key of a URL column — built-in expressions only."""
    after_scheme = F.substring_index(url, "://", -1)
    nofrag = F.substring_index(after_scheme, "#", 1)
    hostport = F.substring_index(nofrag, "/", 1)
    rest = F.substring(nofrag, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.lower(F.substring_index(hostport, ":", 1))
    host = F.when(
        host.startswith("www."), F.substring(host, 5, 1 << 30)
    ).otherwise(host)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    port = F.when(port == "80", F.lit("")).otherwise(port)
    portpart = F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.lower(F.substring_index(rest, "?", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        rest.contains("?"), F.substring_index(rest, "?", -1)
    ).otherwise(F.lit(""))
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    qpart = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted))
    return F.concat(rev, portpart, F.lit(")"), path, qpart)


def cdxj_lines(captures: DataFrame) -> DataFrame:
    """(url, ts, status, mime, digest, length) -> one CDXJ ``line`` per
    capture. The writer half of the index: at scale this is followed by a
    repartitionByRange on surt + sortWithinPartitions to produce the
    sorted shard files CC publishes; line formatting itself is shuffle-free
    codegen."""
    payload = F.format_string(
        '{"url":"%s","status":%d,"mime":"%s","digest":"%s","length":%d}',
        F.col("url"), F.col("status"), F.col("mime"),
        F.col("digest"), F.col("length"),
    )
    return captures.select(
        F.format_string(
            "%s %d %s", surt_col(F.col("url")), F.col("ts"), payload
        ).alias("line")
    )


def parse_cdxj(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ lines -> typed index rows. Malformed lines are skipped (the
    tolerant-parser contract the WARC reader follows). Arrow-batched
    mapInPandas — per-batch Python, never per-row UDF registration."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf[line_col]:
                if not isinstance(line, str):
                    continue
                parts = line.split(" ", 2)
                if len(parts) != 3:
                    continue
                surt, ts_s, payload = parts
                try:
                    ts = int(ts_s)
                    rec = json.loads(payload)
                    rows.append(
                        (
                            surt,
                            ts,
                            str(rec["url"]),
                            int(rec["status"]),
                            str(rec.get("mime", "")),
                            str(rec.get("digest", "")),
                            int(rec.get("length", 0)),
                        )
                    )
                except (ValueError, KeyError, TypeError):
                    continue
            yield pd.DataFrame(
                rows, columns=[f.name for f in CDX_SCHEMA.fields]
            )

    return lines.mapInPandas(run, CDX_SCHEMA)


def cdx_lookup(index: DataFrame, surt_prefix: str) -> DataFrame:
    """Prefix scan over the index — the CDX query primitive. On sorted
    Iceberg/parquet shards partitioned by surt range this prunes to the
    touched files; here it is a predicate Catalyst pushes to the scan."""
    return index.filter(F.col("surt").startswith(surt_prefix))
