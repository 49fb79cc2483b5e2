"""WARC ingestion — Common-Crawl-style pages from WARC response records.

The north-star input (BASELINE.json) is an Iceberg table of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang, ...)``.
Common Crawl publishes WARC/1.0 files (ISO 28500): this module turns raw
WARC bytes into that pages table with one Arrow-batched pass — the
ingestion edge of the pipeline. The reference itself has no WARC reader
(it fetches live); this is the batch-source analogue of its HTTP fetch +
disk cache (S3/S4).

Format subset handled (everything Common Crawl emits for pages):
- records delimited by ``WARC/1.0\\r\\n`` header blocks terminated by a
  blank line, body of exactly ``Content-Length`` bytes, then ``\\r\\n\\r\\n``;
- only ``WARC-Type: response`` records yield pages; request/metadata/
  warcinfo records are skipped;
- the response body is an HTTP/1.x message: status line, headers, blank
  line, entity body (the HTML). ``Content-Type`` is taken from the HTTP
  headers (parameters preserved — the engine's mimetype mux strips them);
- ``WARC-Target-URI`` is the page URL; ``WARC-Date`` (ISO 8601, UTC) is
  the capture timestamp.

``text`` is the tag-stripped, whitespace-collapsed body text (the same
contract the fixture pages use); ``lang`` is left empty — language ID is
a downstream op (textops/analysis.langid_ngram), not an ingestion
concern.

Scale shape: ``spark.read.format("binaryFile")`` (or an Iceberg binary
column) gives one row per WARC file; ``warc_to_pages`` explodes records
inside ``mapInPandas`` so one task never holds more than a batch of
archives; all downstream pruning happens on the typed columns.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame

PAGES_FROM_WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "status int, content_type string"
)

_RX_TAG = re.compile(rb"<[^>]+>")
_RX_WS = re.compile(r"\s+")


def html_to_text(html: bytes) -> str:
    """Tag-strip + whitespace-collapse (the pages-table text contract)."""
    txt = _RX_TAG.sub(b" ", html).decode("utf-8", "replace")
    return _RX_WS.sub(" ", txt).strip()


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


def parse_warc(blob: bytes) -> List[dict]:
    """Parse one WARC file's bytes → list of page dicts (response records
    only). Tolerant: a malformed record ends the scan of that file rather
    than raising (truncated archives are a fact of life at CC scale)."""
    out: List[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers = _parse_headers(blob[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = blob[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        # the body is an HTTP response message
        http_hdr_end = body.find(b"\r\n\r\n")
        if http_hdr_end < 0:
            continue
        status_line = body.split(b"\r\n", 1)[0]
        m = re.match(rb"HTTP/\d\.\d (\d{3})", status_line)
        if m is None:
            continue
        status = int(m.group(1))
        http_headers = _parse_headers(body[:http_hdr_end])
        html = body[http_hdr_end + 4 :]
        ts = _parse_warc_date(headers.get("warc-date"))
        out.append(
            dict(
                url=url,
                warc_ts=ts,
                html=html,
                text=html_to_text(html),
                lang="",
                status=status,
                content_type=http_headers.get("content-type", ""),
            )
        )
    return out


def _parse_warc_date(s: Optional[str]):
    if not s:
        return None
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def warc_to_pages(warc_files: DataFrame, content_col: str = "content") -> DataFrame:
    """(path, content binary, ...) → the engine's pages table.

    One mapInPandas pass; each task parses its batch of archives and emits
    typed page rows — partition pruning / predicate pushdown work on the
    output columns immediately."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang", "status",
                "content_type"]
        for pdf in it:
            rows: List[dict] = []
            for blob in pdf[content_col]:
                if blob is not None:
                    rows.extend(parse_warc(bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return warc_files.mapInPandas(batches, schema=PAGES_FROM_WARC_SCHEMA)


# --------------------------------------------------------------------------
# synthetic WARC builder (tests + the ingest oracle)
# --------------------------------------------------------------------------


def build_warc(pages: List[dict]) -> bytes:
    """Serialize page dicts into a valid WARC/1.0 byte stream (response
    records, CC layout), interleaved with request records the parser must
    skip. The parse(build(pages)) roundtrip is the ingest contract."""
    chunks: List[bytes] = []
    for i, p in enumerate(pages):
        html = p["html"] if isinstance(p["html"], bytes) else p["html"].encode()
        ts = p.get("warc_ts")
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                if ts is not None else "2020-01-01T00:00:00Z")
        # a request record first (must be skipped by the parser)
        req_body = (f"GET / HTTP/1.1\r\nHost: x{i}\r\n\r\n").encode()
        chunks.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: request\r\n"
            + f"WARC-Target-URI: {p['url']}\r\n".encode()
            + f"Content-Length: {len(req_body)}\r\n".encode()
            + b"\r\n" + req_body + b"\r\n\r\n"
        )
        http = (
            f"HTTP/1.1 {int(p['status'])} X\r\n"
            f"Content-Type: {p['content_type']}\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        chunks.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {p['url']}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n"
        )
    return b"".join(chunks)


def pages_to_warc_shards(pages: DataFrame, n_shards: int = 4) -> DataFrame:
    """The WARC WRITE path: pages table -> (path, content binary) shard
    rows, the inverse of ``warc_to_pages``. Records are sharded by
    xxhash64(url) and serialized per shard with the same record layout
    ``build_warc`` emits (request records interleaved, CC style), sorted
    by url within the shard so shard bytes are deterministic for a given
    membership.

    Scale shape: one hash shuffle on the shard key, then applyInPandas
    serializes each shard independently — shard count is the write
    parallelism knob exactly like CC's 1GB-target WARC segmenting. A real
    deployment writes each row's ``content`` straight to object storage
    (foreachPartition sink); returning the bytes as a column keeps the
    sandbox testable."""
    import pandas as _pd
    from pyspark.sql import functions as F

    def emit(key, pdf):
        pdf = pdf.sort_values("url")
        recs = []
        for r in pdf.itertuples(index=False):
            recs.append(dict(
                url=r.url,
                warc_ts=None if _pd.isnull(r.warc_ts) else r.warc_ts,
                html=bytes(r.html),
                status=int(r.status),
                content_type=r.content_type,
            ))
        return _pd.DataFrame(
            [{"path": "part-%05d.warc" % int(key[0]),
              "content": build_warc(recs)}]
        )

    keyed = pages.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards))
    )
    return keyed.groupBy("_shard").applyInPandas(
        emit, "path string, content binary"
    )
