"""S7 / A3-A6 — interval hash-aggregation with per-group agg-type override.

Reference semantics (processor/aggregationprocessor):
  - datapoints grouped by (metric name, full tag set, interval bucket);
    Sum metrics summed, Gauges averaged by default
    (aggregate.go:228-241, :204-226)
  - per-datapoint attr ``_cardinalhq.aggregation_type`` overrides the
    default to min/max/sum/avg (ottl.ParseAggregationType)
  - group-key timestamp = interval start (aggregate.go:64-67)
  - emitted as new single-datapoint rows, delta non-monotonic
    (aggregate.go:46-119); passthrough rows keep flowing (RemoveIf split,
    metrics.go:36-90)

Spark shape: one ``groupBy(window(ts, interval), *keys)`` — Catalyst does
partial+final hash agg automatically (map-side combine), so at 1000
executors the shuffle carries only one partial row per (key, bucket) per
task, not raw datapoints.

The agg-type override computes sum/avg/min/max/count once per group and
selects by the group's agg type — a single aggregation pass, no re-scan,
no UDAF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_aggregate", "aggregate_with_override", "split_by_flag"]


def split_by_flag(df: DataFrame, flag_col: str) -> tuple[DataFrame, DataFrame]:
    """A1/A2 — tag-gated split: (to_aggregate, passthrough).

    The reference walks the tree with RemoveIf (metrics.go:36-90); in the
    relational model the split is two complementary filters over one scan
    (Catalyst reuses the exchange under AQE), and empty-pruning is free.
    """
    p = F.col(flag_col)
    return df.filter(p), df.filter(~p | p.isNull())


def interval_aggregate(
    df: DataFrame,
    keys: list[str],
    interval: str = "10 seconds",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Count (+ optional sum) per (interval bucket, *keys).

    Output carries ``bucket_start`` (= interval start, the group-key
    timestamp rule of aggregate.go:64-67) — aliased for oracle parity.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total"))
    return (
        df.groupBy(F.window(ts_col, interval).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )


def aggregate_with_override(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    agg_type_col: str,
    default_type: str = "avg",
    interval: str = "10 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """A4 — per-row aggregation-type override (min/max/sum/avg).

    The reference reads the type from a datapoint attribute per series
    (aggregate.go:204-226); rows of one group share the type, so we take
    ``first(agg_type)`` per group and select the matching aggregate.
    """
    v = F.col(value_col)
    agg = (
        df.groupBy(F.window(ts_col, interval).alias("w"), *keys)
        .agg(
            F.sum(v).alias("_sum"),
            F.avg(v).alias("_avg"),
            F.min(v).alias("_min"),
            F.max(v).alias("_max"),
            F.count(v).alias("n"),
            F.coalesce(F.first(agg_type_col, ignorenulls=True), F.lit(default_type)).alias("_t"),
        )
    )
    value = (
        F.when(F.col("_t") == "sum", F.col("_sum"))
        .when(F.col("_t") == "min", F.col("_min"))
        .when(F.col("_t") == "max", F.col("_max"))
        .otherwise(F.col("_avg"))
    )
    return (
        agg.withColumn("bucket_start", F.col("w.start"))
        .withColumn("agg_type", F.col("_t"))
        .withColumn("value", value)
        .select(*keys, "bucket_start", "agg_type", "n", "value")
    )
