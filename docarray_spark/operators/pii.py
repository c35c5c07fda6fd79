"""PII detection and redaction for training-data pipelines: emails, phone
numbers, and IPv4 addresses found, counted, and replaced with typed
placeholder tokens (the BigScience ROOTS / CCNet-style scrub step).

Scale design: detection and redaction are ONE map-only Catalyst projection —
`regexp_count` on the original text for the per-kind tallies plus a chain of
`regexp_replace` for the scrub. No explode, no shuffle, no Python; at 100 TB
this fuses into the parquet scan like any other projection.

Patterns are deliberately RE2-safe (no backreferences or lookaround) so the
exact same strings run on Spark (Java regex) and DuckDB/RE2 oracles with
identical match semantics.

The reference engine has no PII operator; this is part of the "beyond the
reference" LLM-pipeline set (SURVEY.md §2 extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: email first so its local-part digits can't be half-eaten by the
# phone pattern; ipv4 last (its dotted digits never overlap the other two
# after their redaction tokens are in place).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts_cols(text: Column | str, patterns: dict[str, str] | None = None) -> list[Column]:
    """One `<kind>_found` LONG column per pattern, counted on the raw text."""
    t = F.col(text) if isinstance(text, str) else text
    pats = patterns or PII_PATTERNS
    return [
        F.regexp_count(t, F.lit(p)).cast("long").alias(f"{kind}_found")
        for kind, p in pats.items()
    ]


def pii_redact_col(text: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Text with every PII match replaced by ``<KIND>`` (chained global
    regexp_replace, applied in dict order)."""
    t = F.col(text) if isinstance(text, str) else text
    for kind, p in (patterns or PII_PATTERNS).items():
        t = F.regexp_replace(t, p, f"<{kind.upper()}>")
    return t


def pii_scrub(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """→ ``(id_col, <kind>_found …, has_pii, redacted_text)`` — counts are
    measured on the original text, then the scrub replaces matches with
    typed tokens. Single projection, map-only."""
    pats = patterns or PII_PATTERNS
    counts = pii_counts_cols(text_col, pats)
    out = df.select(id_col, *counts, pii_redact_col(text_col, pats).alias("redacted_text"))
    has = None
    for kind in pats:
        c = F.col(f"{kind}_found") > 0
        has = c if has is None else (has | c)
    return out.withColumn("has_pii", has).select(
        id_col, *[f"{k}_found" for k in pats], "has_pii", "redacted_text"
    )
