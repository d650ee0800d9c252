"""PII detection/redaction over document text — a first-class
training-data-pipeline operator (no reference counterpart; the
reference has no document corpus, SURVEY §0).

All patterns are deliberately restricted to the regex subset where
Java regex (Spark, executor-side codegen) and RE2 (DuckDB oracle)
agree exactly: character classes, bounded quantifiers, ``\\b`` word
boundaries — no lookaround, no backreferences. That keeps the oracle
bit-for-bit reproducible.

Scale shape: pure per-row ``regexp_replace`` / ``regexp_extract_all``
expressions — whole-stage codegen, zero shuffle, embarrassingly
parallel; at 100 TB this runs at scan speed. Redaction order is fixed
(emails → phones → IPv4) so replacement tokens can never be re-matched
by a later pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) in redaction order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def scrub(col: Column | str) -> Column:
    """Redact every PII pattern, in order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """One ``n_<name>`` count column per pattern (pre-redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
