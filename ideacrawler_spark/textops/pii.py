"""PII scrubbing — the redaction pass a web-scale training pipeline runs
before anything else ships.

Patterns are deliberately conservative and CROSS-ENGINE SAFE: the same
regex text compiles identically under Java regex (Spark) and RE2
(DuckDB oracle) — ASCII classes only, no lookarounds, no backrefs.
Everything is a map-side projection (regexp_replace / regexp_extract_all
inside whole-stage codegen): zero shuffles, column pruning intact, so a
100 TB scrub costs one pass over the text column.

Replacement order matters: emails first (an email's local part may
contain '+', which the phone pattern would otherwise bite), then IPs,
then phones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}"


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones): redact emails,
    IPv4 addresses and international phone numbers to typed tokens,
    counting each exactly (integer outputs, oracle-checkable)."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(
        F.regexp_extract_all(after_email, F.lit(IP_RE), F.lit(0)))
    after_ip = F.regexp_replace(after_email, IP_RE, "<IP>")
    n_phones = F.size(
        F.regexp_extract_all(after_ip, F.lit(PHONE_RE), F.lit(0)))
    clean = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
    )
