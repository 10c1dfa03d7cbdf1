"""Threshold alert-rule evaluation over windowed aggregates — the
alerting half of a telemetry pipeline (the reference routes and
aggregates; any deployment then asks "which (key, window) rows breach
which rules?").

Rules are DATA, not code: a small frame of (rule_id, key match, op,
threshold). Evaluation is a broadcast join from the aggregate stream to
the rule table plus one CASE expression over the comparison operator —
rules change without a redeploy, and at 100 TB the cost is exactly the
aggregate scan (the rule side is broadcast-sized by construction:
humans author it).

Matching: a rule applies to rows whose ``key_col`` equals its ``key``,
or to every row when its ``key`` is NULL (wildcard). A row can breach
several rules → one output row per (row, breached rule), inner-join
semantics (non-breaching pairs are filtered, not nulled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["evaluate_threshold_rules", "SUPPORTED_OPS"]

SUPPORTED_OPS = (">", ">=", "<", "<=", "==", "!=")


def evaluate_threshold_rules(
    aggs: DataFrame,
    rules: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """aggs × rules → breaches.

    rules schema: ``rule_id`` (string), ``key`` (string, NULL =
    wildcard), ``op`` (one of SUPPORTED_OPS), ``threshold`` (double).
    Output: every aggs column + ``rule_id``, ``op``, ``threshold``.

    Plan note: the NULL-wildcard OR makes this a BroadcastNestedLoopJoin
    by design — with a human-authored rule table that is |aggs|·|rules|
    comparisons streamed over the broadcast, linear and shuffle-free;
    do NOT "fix" it to a hash join by exploding wildcards unless the
    rule table stops being tiny.
    """
    r = F.broadcast(
        rules.select(
            F.col("rule_id"),
            F.col("key").alias("__rk"),
            F.col("op"),
            F.col("threshold").cast("double").alias("threshold"),
        )
    )
    joined = aggs.join(
        r, F.col("__rk").isNull() | (F.col("__rk") == F.col(key_col)), "inner"
    )
    v = F.col(value_col).cast("double")
    t = F.col("threshold")
    breach = (
        F.when(F.col("op") == ">", v > t)
        .when(F.col("op") == ">=", v >= t)
        .when(F.col("op") == "<", v < t)
        .when(F.col("op") == "<=", v <= t)
        .when(F.col("op") == "==", v == t)
        .when(F.col("op") == "!=", v != t)
    )
    return joined.filter(breach).drop("__rk")
