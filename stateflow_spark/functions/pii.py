"""PII detection / redaction kernels — the scrub step every LLM
training-data pipeline runs before anything else (emails, IPv4
addresses, phone numbers), expressed as pure JVM-side regexp columns so
the scan stays in whole-stage codegen with zero Python in the hot path.

Pattern dialect note: Spark compiles Java `java.util.regex`, the DuckDB
oracle compiles RE2. The patterns below deliberately stay inside the
common subset — character classes, bounded quantifiers, `\\b` (ASCII
word boundary in both), no lookaround, no backreferences — so both
engines match identical spans and the redacted text hash-matches
cross-engine.

Redaction order matters and is fixed: emails first (their local parts
may contain digits that a later numeric pattern could otherwise clip),
then IPv4, then phones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{2} \d{3} \d{4}"

#: (pattern, replacement token) in mandatory application order
PII_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def pii_count(text: Column | str, pattern: str) -> Column:
    """Number of matches of one PII pattern (vectorized, JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


def pii_redact(text: Column | str) -> Column:
    """Text with every PII span replaced by its type token, applying
    PII_RULES in order (emails before numeric patterns)."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, token in PII_RULES:
        col = F.regexp_replace(col, pat, token)
    return col
