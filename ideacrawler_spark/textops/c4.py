"""C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) — the canonical line/document filter
stack for web-crawled pretraining text.

Rules implemented (the language-independent subset):
- line kept iff it ends in terminal punctuation (``. ! ? "``), has at
  least ``min_words`` words, and does not mention "javascript";
- document kept iff it has at least ``min_kept_lines`` kept lines and
  contains neither "lorem ipsum" nor a ``{`` (code marker).

Everything is built-in column functions — split / filter / transform
lambdas run inside whole-stage codegen; there is NO Python UDF, so the
pass is a zero-shuffle map over the corpus at any scale. Output carries
exact integers plus an md5 of the cleaned text so a cross-engine oracle
can value-check the full transformation without shipping the text.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TERMINAL_RX = '[.!?"]$'


def _keep_line(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    return (
        t.rlike(TERMINAL_RX)
        & (F.size(F.split(t, " +")) >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_document_filter(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", min_words: int = 5,
                       min_kept_lines: int = 3) -> DataFrame:
    """(doc_id, n_lines, n_kept, keep_doc, kept_md5) per document.

    kept_md5 = md5 of the kept lines re-joined with newlines — the
    cleaned text's fingerprint (computed even for dropped docs, so the
    oracle checks the line pass independently of the doc pass).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _keep_line(l, min_words))
    lower = F.lower(F.col(text_col))
    keep_doc = (
        (F.size(kept) >= min_kept_lines)
        & ~lower.contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        keep_doc.cast("int").alias("keep_doc"),
        F.md5(F.array_join(F.transform(kept, F.trim), "\n")
              .cast("binary")).alias("kept_md5"),
    )
