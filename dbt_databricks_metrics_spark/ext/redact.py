"""PII-pattern redaction for text corpora ([EXT]).

Standard pre-training hygiene: mask emails / phone numbers / URLs / IPv4 /
long digit runs (card-like) before training. Pure `regexp_replace` chains —
codegen'd, single-pass over the scan, no UDFs. Patterns are deliberately
RE2-compatible (no backrefs/lookarounds) so the DuckDB oracle can apply
the identical regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: URLs first (they contain dots/digits that other patterns would
# partially eat), then emails, IPs, phones, long digit runs
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # requires at least one separator so bare digit runs (card-like)
    # fall through to the <NUM> pattern instead
    ("phone", r"\+?\(?[0-9]{1,3}\)?[\s\-][0-9()\-\s]{5,}[0-9]", "<PHONE>"),
    ("digits", r"\b[0-9]{9,}\b", "<NUM>"),
)


def redact_text(col: Column) -> Column:
    out = col
    for _name, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace *text_col* with the redacted text + per-pattern hit counts
    (counts computed on the ORIGINAL text, before masking)."""
    out = df
    for name, pattern, _token in PII_PATTERNS:
        # count-only: same value as size(regexp_extract_all) without
        # materializing the match array per row
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pattern))
        )
    return out.withColumn(text_col, redact_text(F.col(text_col)))
