"""S5 — rule-based routing (routingconnector analogue, manifest :282).

A rule table (rule_id priority, SQL predicate, sink label) compiles to a
single ``CASE WHEN`` chain — first match wins, explicit default sink for
no-match rows (routingconnector default-pipelines semantics). One pass,
one projection; the fan-out write then partitions by the label
(batchperresourceattr analogue, awss3exporter/factory.go:93-101) instead
of rescanning per sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["route", "routing_case_sql"]

DEFAULT_SINK = "default"


def route(
    df: DataFrame,
    rules: list[dict],
    sink_col: str = "sink",
    default_sink: str = DEFAULT_SINK,
) -> DataFrame:
    """Add ``sink_col`` per the first-matching rule predicate."""
    expr: Column | None = None
    for rule in sorted(rules, key=lambda r: r["rule_id"]):
        cond = F.expr(rule["predicate"])
        expr = F.when(cond, F.lit(rule["sink"])) if expr is None else expr.when(cond, F.lit(rule["sink"]))
    col = F.lit(default_sink) if expr is None else expr.otherwise(F.lit(default_sink))
    return df.withColumn(sink_col, col)


def routing_case_sql(rules: list[dict], default_sink: str = DEFAULT_SINK) -> str:
    """The same rule table as an ANSI CASE expression (for SQL engines /
    the DuckDB oracle)."""
    whens = " ".join(
        f"WHEN ({r['predicate']}) THEN '{r['sink']}'"
        for r in sorted(rules, key=lambda r: r["rule_id"])
    )
    return f"CASE {whens} ELSE '{default_sink}' END"
