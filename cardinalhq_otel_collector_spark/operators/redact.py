"""S3 — PII redaction + attribute rewrite (redactionprocessor /
transformprocessor / attributesprocessor analogues, manifest :258,:266,:239).

Chained ``regexp_replace`` — pure JVM expressions. The pattern table is a
config-level object (list of (name, regex, mask)); order matters (applied
in sequence, like OTTL statement lists). ``has_pii`` is computed on the
*pre-masked* text so routing can see it (the reference computes conditions
before mutation within one OTTL statement context).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["DEFAULT_PII_PATTERNS", "redact", "rewrite_attributes"]

# (name, java-regex, mask). Deliberately simple regex subset so the same
# pattern is valid in Java (Spark) and RE2 (DuckDB oracle).
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("uuid", r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", "<UUID>"),
    ("phone", r"\+?1[-. ]\(?\d{3}\)?[-. ]\d{3,4}(?:[-. ]\d{4})?", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]

# Round-6 per-task-work guards (guide §1.2 step 2): a literal character
# the regex PROVABLY requires in any match, keyed by the exact regex text
# (only the known default patterns get a guard — a custom regex runs
# unguarded). `contains` is a cheap codegen'd scan, so rows that cannot
# match skip the regex engine entirely; outputs are identical because
# regexp_replace is the identity on non-matching rows. Guards test the
# PRE-CHAIN text, which is sound only while no earlier mask can introduce
# the guard character — checked at plan-build time in redact().
_GUARD_HINTS: dict[str, str] = {
    DEFAULT_PII_PATTERNS[0][1]: "@",
    DEFAULT_PII_PATTERNS[1][1]: "-",
    DEFAULT_PII_PATTERNS[2][1]: "1",
    DEFAULT_PII_PATTERNS[3][1]: ".",
}


def redact(
    df: DataFrame,
    patterns: list[tuple[str, str, str]] | None = None,
    text_col: str = "text",
    out_col: str = "text_redacted",
    flag_col: str = "has_pii",
) -> DataFrame:
    """Mask PII in ``text_col`` → ``out_col``; flag rows that matched.

    The original column is left untouched: the per-turn text-equality
    invariant (body passthrough, body_marshaler.go:25-44) rides on the
    original, sinks that require masking select ``out_col``.
    """
    patterns = DEFAULT_PII_PATTERNS if patterns is None else patterns
    orig = F.col(text_col)
    masked: Column = orig
    for idx, (_, regex, mask) in enumerate(patterns):
        rep = F.regexp_replace(masked, regex, mask)
        hint = _GUARD_HINTS.get(regex)
        earlier_masks = [m for _, _, m in patterns[:idx]]
        if hint and not any(hint in m for m in earlier_masks):
            # skip the regex pass on rows whose ORIGINAL text lacks the
            # required literal (sound: earlier masks cannot introduce it)
            masked = F.when(F.contains(orig, F.lit(hint)), rep).otherwise(masked)
        else:
            masked = rep
    # has_pii = "masking changed the text": one string compare instead of
    # one rlike scan per pattern (masks are chosen so no replacement can
    # itself match a pattern, making the equivalence exact)
    out = df.withColumn(out_col, masked)
    return out.withColumn(
        flag_col, F.coalesce(F.col(out_col) != F.col(text_col), F.lit(False))
    )


def rewrite_attributes(
    df: DataFrame,
    set_attrs: dict[str, object] | None = None,
    rename: dict[str, str] | None = None,
    drop: list[str] | None = None,
) -> DataFrame:
    """attributesprocessor insert/update/delete + schemaprocessor rename,
    as plain column ops (attrs are promoted columns in our model —
    SURVEY.md §1.3)."""
    out = df
    for k, v in (set_attrs or {}).items():
        out = out.withColumn(k, v if isinstance(v, Column) else F.lit(v))
    for old, new in (rename or {}).items():
        out = out.withColumnRenamed(old, new)
    if drop:
        out = out.drop(*drop)
    return out
