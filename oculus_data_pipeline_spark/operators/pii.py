"""PII detection and redaction for training-data curation.

Web-scale corpus pipelines (C4, Dolma, RefinedWeb) scrub personally
identifiable information before training; this operator is that stage
as pure JVM Column expressions — ``regexp_count`` over the original
text per category plus one chained ``regexp_replace`` pass for the
redacted output. No UDFs, no shuffle: a narrow map over the scan, so
at 100 TB it runs at parquet-read speed and composes with any
downstream filter (e.g. drop docs whose PII density exceeds a bound).

The patterns use only RE2-and-Java-compatible syntax (character
classes, bounded repeats, ``\\b`` word boundaries — no lookarounds),
so the DuckDB oracle evaluates the exact same regexes.

Reference parity: the reference has no PII stage (its corpus is
historical documents); this is a north-star addition per the
training-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: email first (its local part may contain digit runs), then
# phone before SSN (an SSN-shaped window never survives inside a
# redacted phone), IPv4 last. Counts are all taken on the ORIGINAL
# text; redaction chains in this order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,2}-\d{3}-\d{3}-\d{4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def detect_and_redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII category counts + fully redacted text.

    Returns (id, n_<category>..., redacted). Each category count is
    ``regexp_count`` on the original text; ``redacted`` applies
    ``regexp_replace`` per category in dict order, substituting
    ``<CATEGORY>`` placeholders. Everything stays in whole-stage
    codegen — one projection, zero exchanges.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(f"n_{k}")
        for k, p in pats.items()
    ]
    red = F.col(text_col)
    for k, p in pats.items():
        red = F.regexp_replace(red, p, f"<{k.upper()}>")
    return docs.select(F.col(id_col).alias("id"), *counts, red.alias("redacted"))


def pii_count_sql(expr: str, pattern: str) -> str:
    """DuckDB count of regex matches, mirroring ``regexp_count``."""
    pat = pattern.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def pii_redact_sql(expr: str, patterns: dict[str, str] | None = None) -> str:
    """DuckDB chained global regexp_replace mirroring the Spark plan."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = expr
    for k, p in pats.items():
        pat = p.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '<{k.upper()}>', 'g')"
    return out
