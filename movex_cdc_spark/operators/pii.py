"""PII scrubbing — regex redaction of emails / IPv4 / E.164 phones /
SSN-shaped ids, the standard pre-training privacy pass.

All patterns are written in the common subset of Java regex (Spark)
and RE2 (DuckDB oracle): character classes, bounded repeats, \\b —
no lookaround, no backreferences. Every replace/count is a codegen
string expression over one corpus scan: zero shuffle, zero UDF, so
the pass costs one linear read at any corpus size and pipelines with
the other curation projections in the same stage.

Not in the reference (curation mandate). Redaction tokens are typed
(``<EMAIL>`` etc.) so downstream token statistics stay meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ID_COL = "doc_id"
TEXT_COL = "text"

# category -> (pattern, replacement token); ORDER MATTERS: emails are
# scrubbed before phones so the digits inside a local part can't be
# re-matched, and SSNs before IPv4 cannot collide (dash vs dot).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{6,14}\b", "<PHONE>"),
]


def scrub_pii(df: DataFrame, id_col: str = ID_COL, text_col: str = TEXT_COL) -> DataFrame:
    """Per-doc scrub: returns ``(id, n_email, n_ssn, n_ipv4, n_phone,
    scrubbed)`` where counts are matches found BEFORE scrubbing (in
    pattern order, each count on the text as the previous category
    left it) and ``scrubbed`` is the fully redacted text."""
    out = df.select(id_col, F.col(text_col).alias("_t"))
    counts = []
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count("_t", F.lit(pat))).withColumn(
            "_t", F.regexp_replace("_t", pat, token)
        )
        counts.append(f"n_{name}")
    return out.select(id_col, *counts, F.col("_t").alias("scrubbed"))
