"""PII detection and redaction over a text column.

A standard pre-training scrub stage (BigScience/ROOTS-style regex PII
pass): detect e-mail addresses, US-style phone numbers, and IPv4
addresses, count them per document, and rewrite the text with typed
placeholder tokens.

Scale posture: pure column expressions (``regexp_count`` /
``regexp_replace``) — shuffle-free, whole-stage-codegen, map-only; the
per-source report is one partial-aggregated groupBy. No Python UDFs.

The patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle) — character classes, bounded quantifiers, ``\\b`` —
so both engines tokenize identically; no lookaround, no backreferences.

Reference analogue: none (beyond-reference surface; the reference's
closest habit is guarded field extraction, ``proto_data_analysis.py``'s
rule table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Ordered (name, pattern, replacement) rules. Order matters: e-mails are
#: redacted first (their local part may contain digits/dots that the IP
#: pattern could otherwise bite into), then phones, then bare IPv4s.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts, keyed by rule name. Counts are taken on the
    ORIGINAL text (before any redaction), so classes never see each
    other's placeholder tokens."""
    return {name: F.regexp_count(text, F.lit(pat)) for name, pat, _ in PII_RULES}


def redact(text: Column) -> Column:
    """Apply every rule's replacement in ``PII_RULES`` order. Sequential
    ``regexp_replace`` keeps the whole chain inside codegen."""
    out = text
    for _, pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def scan_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII report: one count column per rule plus the total
    and the redacted text. Map-only."""
    text = F.col(text_col)
    counts = pii_counts(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii"),
        redact(text).alias("redacted_text"),
    )


def pii_report_by_source(
    df: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    """Per-source corpus PII prevalence: doc counts, docs-with-PII, and
    per-class totals. One partial-aggregated shuffle on ``source_col``."""
    text = F.col(text_col)
    counts = pii_counts(text)
    per_doc = df.select(
        F.col(source_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )
    hit = None
    for name in counts:
        col = F.col(f"n_{name}")
        hit = col if hit is None else hit + col
    return per_doc.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((hit > 0).cast("long")).alias("n_docs_with_pii"),
        *[F.sum(f"n_{name}").alias(f"total_{name}") for name in counts],
    )
