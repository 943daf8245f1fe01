"""PII / sensitive-pattern scrubbing — redaction for training corpora.

Every serious pretraining pipeline (C4, Dolma, RefinedWeb) runs a
regex-family pass that counts and masks emails, IP addresses, and
long digit runs (phone/account numbers) before training. No reference
analog (the reference is a search library); this belongs to the
data-pipeline surface this engine adds.

Patterns deliberately use the common regex subset that Java regex
(Spark) and RE2 (DuckDB/Go) interpret identically — no backrefs, no
lookaround — so the operator is oracle-duelable and portable.

Scale shape: pure per-row Catalyst (`regexp_count` / `regexp_replace`),
map-only, whole-stage codegen; at 100 TB this pass is bounded by scan
bandwidth like any projection.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters: earlier rules run first,
# so an email is masked before the digit rule can eat its local part.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("longdigits", r"[0-9]{9,}", "<NUM>"),
]


def pii_stats(text: Column) -> list[Column]:
    """Per-rule match counts, one column per rule (n_email, n_ipv4,
    n_longdigits)."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]


def pii_redact(text: Column) -> Column:
    """Text with every rule's matches replaced by its mask token,
    applied in rule order."""
    out = text
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df plus per-rule counts and a redacted text column. Map-only."""
    t = F.col(text_col)
    return df.select(
        "*", *pii_stats(t), pii_redact(t).alias(f"{text_col}_redacted")
    )
