"""Text cleaning / PII redaction for training-corpus preparation.

The standard pre-tokenization hygiene pass of an LLM data pipeline: mask
personally-identifiable substrings (emails, URLs, phone-shaped numbers) with
typed placeholders and normalize whitespace. Everything is chained
``regexp_replace`` / ``regexp_count`` Column expressions — JVM-side,
whole-stage-codegen'd, scan-bound at 100 TB (no shuffle, no Python).

Regex portability: patterns are written in the common subset of Java regex
(Spark) and RE2 (DuckDB oracle) — no backreferences, no lookaround — so the
oracle runs the byte-identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern -> placeholder, applied in order (URL first: an URL may embed an
# '@' that the email pattern would otherwise split).
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def redact_pii(text: Column | str) -> Column:
    """Mask every PII_RULES match with its placeholder, in rule order."""
    c = _col(text)
    for pattern, placeholder in PII_RULES:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def normalize_whitespace(text: Column | str) -> Column:
    """Collapse whitespace runs to single spaces and trim the ends."""
    return F.trim(F.regexp_replace(_col(text), r"\s+", " "))


def clean_corpus(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact + normalize each document; emit the cleaned text alongside
    per-rule redaction counts and the size delta so downstream filters can
    gate on "how much was masked" (heavily-redacted docs are usually lists
    of contacts, not prose).
    """
    c = F.col(text_col)
    out = df.select(
        F.col(id_col),
        normalize_whitespace(redact_pii(c)).alias("clean_text"),
        F.regexp_count(c, F.lit(PII_RULES[0][0])).alias("n_urls"),
        F.regexp_count(c, F.lit(PII_RULES[1][0])).alias("n_emails"),
        F.regexp_count(c, F.lit(PII_RULES[2][0])).alias("n_phones"),
        F.length(c).cast("int").alias("n_chars_raw"),
    )
    return out.withColumn(
        "n_chars_clean", F.length("clean_text").cast("int")
    )
