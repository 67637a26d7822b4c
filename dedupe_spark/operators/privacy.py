"""PII scrubbing for training corpora: detect + redact emails, IPv4
addresses, and phone-shaped digit runs with pure-JVM regex expressions.

Every production corpus pass runs a scrub step next to dedup (C4's
"badwords"/cleanup pass, the public BigScience/ROOTS PII pipeline) —
the reference's analog is the normalize-before-fingerprint step
(/root/reference/src/deduplication.cpp:947-983): a deterministic
per-row text rewrite that runs BEFORE keys are built, so two documents
differing only in PII still collide on their blocking key.

Scale shape: one projection of `regexp_replace`/`regexp_count`
expressions — whole-stage codegen, zero shuffles, zero Python. At
100 TB this is scan-bandwidth-bound, exactly what you want for a
full-corpus rewrite. The patterns avoid lookarounds so the same regex
is valid for Spark (java.util.regex) and the DuckDB/RE2 oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lookaround-free so Java regex and RE2 agree; \b is supported by both.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# Order matters: IPv4 before PHONE is irrelevant here (disjoint shapes),
# but EMAIL must run before PHONE so digits inside a local-part are
# consumed by the email token, not double-counted.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_expr(c: Column) -> Column:
    """Text with every PII rule applied, in PII_RULES order."""
    for _, pat, token in PII_RULES:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted, n_email, n_ipv4, n_phone, has_pii) per row.

    Counts are measured on the progressively-redacted text (rule i+1
    counts on text already scrubbed by rules 0..i), matching what the
    replacement pass actually removes.
    """
    out = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    cur = F.col("_t")
    counts = []
    for name, pat, token in PII_RULES:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, token)
        counts.append(F.col(f"n_{name}"))
    has = counts[0] + counts[1] + counts[2] > 0
    return out.select(
        "id",
        cur.alias("redacted"),
        *[f"n_{name}" for name, _, _ in PII_RULES],
        has.alias("has_pii"),
    )
