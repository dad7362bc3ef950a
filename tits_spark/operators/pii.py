"""PII detection and redaction for training corpora.

Standard pre-training hygiene (public pipelines: C4, The Pile, ROOTS/
BigScience `muliwai`, RefinedWeb all ship a regex PII pass): find
emails, IPv4 addresses, SSN-shaped ids, and long digit runs
(phone/credit-card shaped) in document text, replace them with typed
placeholder tokens, and report per-document counts so downstream
filters can drop PII-dense documents.

Everything is built-in column expressions (``regexp_replace`` /
``regexp_count`` — JVM-side, whole-stage codegen, map-only: zero
shuffles, zero Python). The patterns deliberately stay inside the
common subset of Java regex (Spark) and RE2 (DuckDB) — no backrefs, no
lookaround — so the DuckDB oracle can run the *identical* pattern
strings; they are compiled from the same module constants.

At 100 TB this is the cheapest kind of operator there is: a narrow
map over the text column that fuses into whatever scan/filter stage
already reads it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied in sequence; SSN before the generic digit-run so a
# 9-digit SSN with dashes is typed as SSN, not swallowed by DIGITS.
# Each pattern is valid and identical in Java regex and RE2.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IPV4", r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    # phone / card shaped: 9+ digits allowing single spaces/dashes/dots
    # between groups, optional leading +
    ("DIGITS", r"\+?\b[0-9](?:[ .-]?[0-9]){8,}\b"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_clean",
) -> DataFrame:
    """Add per-type PII counts, a total, and the redacted text.

    The types in :data:`PII_PATTERNS` are applied as one chained
    ``regexp_replace`` pipeline, and each type's count is measured on
    the text as redacted by the *earlier* types — so overlapping
    matches resolve deterministically and never double-count (the
    digits of an already-redacted SSN are ``<SSN>`` by the time the
    DIGITS pattern runs).

    NULL text yields zero counts and NULL ``out_col`` (regexp functions
    would otherwise propagate NULL counts, silently excluding the doc
    from both sides of any density threshold downstream).
    """
    cols = [df["*"]]
    total = F.lit(0)
    # count/redact over '' for NULL text so counts are 0, not NULL
    cur: Column = F.coalesce(F.col(text_col), F.lit(""))
    for name, pat in PII_PATTERNS:
        c = F.regexp_count(cur, F.lit(pat))
        cols.append(c.cast("long").alias(f"n_{name.lower()}"))
        total = total + c
        cur = F.regexp_replace(cur, F.lit(pat), F.lit(f"<{name}>"))
    cols.append(total.cast("long").alias("n_pii"))
    cols.append(
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(cur)
        .alias(out_col)
    )
    return df.select(*cols)


def pii_density(max_per_kchar: float, text_col: str = "text") -> Column:
    """Keep-predicate: PII matches per 1000 chars <= threshold. The ONE
    definition shared by :func:`drop_pii_dense` and the curate job's
    --pii-max-per-kchar post-gate; expects :func:`pii_scrub` columns.
    NULL/empty text has density 0 (kept)."""
    density = F.col("n_pii") * 1000.0 / F.greatest(
        F.length(F.coalesce(F.col(text_col), F.lit(""))), F.lit(1)
    )
    return density <= F.lit(float(max_per_kchar))


def drop_pii_dense(
    df: DataFrame,
    max_pii_per_kchar: float = 5.0,
    text_col: str = "text",
) -> DataFrame:
    """Remove documents whose PII density (matches per 1000 chars)
    exceeds the threshold — PII-dense pages are usually scraped
    directories/dumps with no training value. Keeps original columns
    plus the redacted text."""
    scrubbed = pii_scrub(df, text_col=text_col)
    return scrubbed.filter(pii_density(max_pii_per_kchar, text_col))
