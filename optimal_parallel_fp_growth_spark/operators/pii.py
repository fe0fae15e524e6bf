"""PII detection and redaction — the compliance-filter stage of an LLM
training-data pipeline (no reference counterpart; driver north star).

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — no backreferences, no lookaround, literal
dots bracketed — so the DuckDB oracle reproduces matches exactly
(probed: identical extractions in both engines). Both operators are
single-scan narrow projections: no shuffle, no Python, whole-stage
codegen end-to-end, which is the only acceptable shape for a pass that
must touch every byte of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies in this sequence (email → phone → ip);
# the patterns are mutually non-overlapping on realistic text.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
    ("phone", "[+]?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"),
    ("ip", "([0-9]{1,3}[.]){3}[0-9]{1,3}"),
)


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts. → (doc_id, n_email, n_phone, n_ip,
    has_pii)."""
    counts = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    out = docs.select("doc_id", *counts)
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with a typed placeholder
    (``<EMAIL>`` / ``<PHONE>`` / ``<IP>``), applied in PII_PATTERNS
    order. → (doc_id, text_redacted)."""
    red = F.col(text_col)
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select("doc_id", red.alias("text_redacted"))
