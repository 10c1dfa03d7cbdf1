"""genainormalizerprocessor analogue (distribution/components.go:126,:713 —
the bundled contrib processor normalizing GenAI telemetry to the public
``gen_ai.*`` semantic conventions).

Especially relevant here: the north-star input IS GenAI transcript turns.
Three normalizations, all pure projections (no shuffle):

  * role synonyms → the canonical four (user/assistant/system/tool) —
    vendor SDKs emit Human/AI/bot/function/…
  * model string → (gen_ai.system, model family): "gpt-4-turbo-2024-04-09"
    → ("openai", "gpt-4"); "claude-3-opus-20240229" → ("anthropic",
    "claude-3"); version/date suffixes stripped per the semconv guidance
    that gen_ai.request.model is the family the caller asked for.
  * legacy attribute names (llm.model / ai.model / model_name …) →
    gen_ai.request.model (schema-style rename).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_role", "normalize_model", "normalize_genai"]

# lowercase synonym → canonical role
_ROLE_SYNONYMS: dict[str, str] = {
    "user": "user", "human": "user", "end_user": "user",
    "assistant": "assistant", "ai": "assistant", "bot": "assistant",
    "model": "assistant", "agent": "assistant",
    "system": "system", "developer": "system", "instruction": "system",
    "tool": "tool", "function": "tool", "tool_call": "tool",
    "tool_result": "tool",
}

# model-name prefix → gen_ai.system
_SYSTEM_PREFIXES: list[tuple[str, str]] = [
    ("gpt", "openai"), ("o1", "openai"), ("o3", "openai"),
    ("claude", "anthropic"),
    ("gemini", "gcp.gemini"), ("palm", "gcp.gemini"),
    ("llama", "meta"), ("mistral", "mistral_ai"), ("mixtral", "mistral_ai"),
]


def normalize_role(col: Column) -> Column:
    """Role synonym table → canonical role; unknown inputs pass through
    lowercased (the processor leaves unrecognized values intact)."""
    lowered = F.lower(F.trim(col))
    expr = None
    for syn, canon in _ROLE_SYNONYMS.items():
        cond = lowered == syn
        expr = F.when(cond, canon) if expr is None else expr.when(cond, canon)
    return expr.otherwise(lowered)


def normalize_model(col: Column) -> tuple[Column, Column]:
    """(gen_ai.system, model family) from a raw model string.

    Family = the model name with trailing -YYYY[-MM[-DD]] dates, version
    snapshots (-NNNN), and size/variant suffixes (-turbo/-latest/-preview)
    stripped — a deterministic regex chain, no lookup table needed.
    """
    lowered = F.lower(F.trim(col))
    system = F.lit("unknown")
    for prefix, sysname in reversed(_SYSTEM_PREFIXES):
        system = F.when(lowered.startswith(prefix), sysname).otherwise(system)
    family = F.regexp_replace(lowered, r"-\d{8}$", "")                    # -YYYYMMDD
    family = F.regexp_replace(family, r"-\d{4}(-\d{2})?(-\d{2})?$", "")   # -YYYY[-MM[-DD]]
    family = F.regexp_replace(family, r"[.@]\d+$", "")                    # @ver / .rev
    family = F.regexp_replace(family, r"-(latest|preview|turbo|instant|mini|nano)$", "")
    return system, family


def normalize_genai(
    df: DataFrame,
    role_col: str = "role",
    model_col: str | None = None,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Full normalization pass: canonical role (+ original kept as
    ``<role>_raw``), gen_ai.system / model family columns when a model
    column exists, legacy-name renames."""
    out = df.withColumn(f"{role_col}_raw", F.col(role_col)).withColumn(
        role_col, normalize_role(F.col(role_col))
    )
    if model_col is not None:
        system, family = normalize_model(F.col(model_col))
        out = out.withColumn("gen_ai_system", system).withColumn(
            "gen_ai_request_model", family
        )
    for old, new in (rename or {}).items():
        out = out.withColumnRenamed(old, new)
    return out
