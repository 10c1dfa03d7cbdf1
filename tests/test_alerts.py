"""Threshold alert rules: operator matrix, wildcard matching, multi-rule
fan-out, and the intentional broadcast-NL plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.alerts import (
    evaluate_threshold_rules,
)


def _frames(spark):
    aggs = spark.createDataFrame(
        [("error", 5), ("error", 3), ("view", 10), ("click", 8)],
        "k string, n long",
    )
    rules = spark.createDataFrame(
        [
            ("gt", "error", ">", 4.0),
            ("ge", "error", ">=", 3.0),
            ("lt", "click", "<", 9.0),
            ("le", "click", "<=", 8.0),
            ("eq", "view", "==", 10.0),
            ("ne", "view", "!=", 10.0),
            ("wild", None, ">=", 10.0),
        ],
        "rule_id string, key string, op string, threshold double",
    )
    return aggs, rules


def test_operator_matrix_and_wildcard(spark):
    aggs, rules = _frames(spark)
    out = evaluate_threshold_rules(aggs, rules, key_col="k", value_col="n")
    got = sorted((r.k, r.n, r.rule_id) for r in out.collect())
    assert got == sorted(
        [
            ("error", 5, "gt"),      # 5 > 4
            ("error", 5, "ge"),      # 5 >= 3
            ("error", 3, "ge"),      # 3 >= 3 (boundary)
            ("click", 8, "lt"),      # 8 < 9
            ("click", 8, "le"),      # 8 <= 8 (boundary)
            ("view", 10, "eq"),      # == fires
            ("view", 10, "wild"),    # NULL key matches any row
        ]
    )
    # != never fires on the equal value; > not at boundary
    assert ("error", 3, "gt") not in got and ("view", 10, "ne") not in got


def test_output_carries_rule_columns(spark):
    aggs, rules = _frames(spark)
    out = evaluate_threshold_rules(aggs, rules, key_col="k", value_col="n")
    assert {"rule_id", "op", "threshold"} <= set(out.columns)
    assert "__rk" not in out.columns


def test_plan_is_broadcast(spark):
    aggs, rules = _frames(spark)
    plan = (
        evaluate_threshold_rules(aggs, rules, key_col="k", value_col="n")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the NULL-wildcard OR forces nested-loop — it must at least be the
    # BROADCAST variant (rule side tiny by contract), never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
