"""spanmetricsconnector analogue — RED metrics with explicit-bounds latency
histograms (SURVEY.md §2B maps spanmetrics' histogram to width_bucket-style
bucketing; the connector's default is an explicit-bounds histogram with
cumulative ``le`` buckets).

One projection computes the bucket label; one hash aggregation produces the
(keys, bucket) counts — Catalyst's partial+final agg keeps the shuffle at
group cardinality. ``cumulative_histogram`` converts to Prometheus-style
cumulative ``le`` counts with a window sum over the bucket ordering (bucket
count is config-bounded, so the window partition is tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bucket_index",
    "latency_histogram",
    "red_metrics",
    "exp_bucket_index",
    "exp_histogram",
    "histogram_quantile",
]


def bucket_index(value: Column, bounds: list[float]) -> Column:
    """Explicit-bounds bucket index: #bounds strictly below value — i.e.
    bucket i covers (bounds[i-1], bounds[i]], the OTLP histogram convention
    (value ≤ bound goes in that bucket); index len(bounds) = overflow."""
    idx = F.lit(0)
    for b in bounds:
        idx = idx + F.when(value > F.lit(float(b)), 1).otherwise(0)
    return idx


def latency_histogram(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    bounds: list[float],
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """(keys, bucket_start, bucket_idx, le, bucket_count) — non-cumulative
    per-bucket counts. ``le`` is the bucket's upper bound rendered as a
    string ('+Inf' for overflow), the metric naming spanmetrics emits."""
    idx = bucket_index(F.col(value_col), bounds)
    le = F.element_at(
        F.array(*[F.lit(f"{b:g}") for b in bounds] + [F.lit("+Inf")]), idx + 1
    )
    return (
        df.withColumn("bucket_idx", idx)
        .withColumn("le", le)
        .groupBy(F.window(ts_col, interval).alias("w"), *keys, "bucket_idx", "le")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )


def red_metrics(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    error_predicate: str,
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Rate/Errors/Duration per (keys, interval): call count, error count,
    decimal-summed total duration, min/max — the spanmetrics calls+duration
    metric pair in one aggregation pass."""
    v = F.col(value_col)
    return (
        df.groupBy(F.window(ts_col, interval).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.sum(F.when(F.expr(error_predicate), 1).otherwise(0)).alias("errors"),
            F.sum(v.cast("decimal(18,6)")).cast("double").alias("duration_sum"),
            F.min(v).alias("duration_min"),
            F.max(v).alias("duration_max"),
        )
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )


def exp_bucket_index(value: Column, min_exp: int = -16, max_exp: int = 16) -> Column:
    """OTel exponential-histogram bucket index at scale 0 (base 2):
    bucket i covers (2^i, 2^(i+1)] — index = (count of boundaries
    2^e, e in [min_exp, max_exp], strictly below value) + min_exp - 1.

    Same comparison-ladder construction as ``bucket_index`` (the
    boundaries are EXACT double literals — integer powers of two — so
    every comparison is engine-exact; no log2(), whose last-ulp
    behavior is libm-defined and would put boundary values in
    different buckets on different engines). The ladder is
    config-bounded (a few dozen branches), fully codegen'd, zero
    joins. Values <= 2^min_exp clamp to the underflow index
    (min_exp - 1); values > 2^max_exp land in max_exp.
    """
    idx = F.lit(min_exp - 1)
    for e in range(min_exp, max_exp + 1):
        idx = idx + F.when(value > F.lit(float(2.0**e)), 1).otherwise(0)
    return idx


def exp_histogram(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    min_exp: int = -16,
    max_exp: int = 16,
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exponential (base-2, scale-0) histogram per (keys, interval):
    the OTLP ExponentialHistogram datapoint shape — one projection for
    the bucket index, one hash aggregation (partial+final, shuffle at
    group cardinality). NULL and non-positive values are counted in
    ``zero_count`` per the OTLP convention (negative buckets are out of
    scope for latency-shaped data).
    """
    v = F.col(value_col)
    bucketed = df.withColumn(
        "bucket_idx",
        F.when(
            v.isNull() | (v <= 0), F.lit(None).cast("int")
        ).otherwise(exp_bucket_index(v, min_exp, max_exp).cast("int")),
    )
    return (
        bucketed.groupBy(F.window(ts_col, interval).alias("w"), *keys, "bucket_idx")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )


def histogram_quantile(
    hist: DataFrame,
    keys: list[str],
    bounds: list[float],
    q_num: int,
    q_den: int,
    idx_col: str = "bucket_idx",
    count_col: str = "bucket_count",
) -> DataFrame:
    """PromQL-style histogram_quantile over explicit-bounds bucket
    counts (the read-side of latency_histogram): find the bucket where
    the running count crosses q*total, then linearly interpolate inside
    its [lo, hi] bound span — rank r = q*total computed as an exact
    integer-scaled target (r_scaled = q_num*total vs cum*q_den, no
    float rank), interpolation as ONE fixed IEEE expression tree over
    exact integers and literal bounds, rounded to 6 places
    (group_percentiles discipline).

    Plan: one window cumsum per (keys) over the config-bounded bucket
    ordering + a filter taking the first crossing bucket — group-sized
    partitions, never data-sized. The overflow bucket (idx ==
    len(bounds)) has no finite upper bound; crossings there clamp to
    the last finite bound, as PromQL does.
    """
    if not bounds:
        raise ValueError("histogram_quantile needs explicit bucket bounds")
    if not (0 < q_num <= q_den):
        raise ValueError("quantile must satisfy 0 < q_num/q_den <= 1")
    # overflow bucket: lo == hi == last finite bound, so the
    # interpolation collapses to exactly that bound (PromQL's clamp)
    lo_expr = F.lit(float(bounds[-1]))
    hi_expr = F.lit(float(bounds[-1]))
    for i, b in enumerate(bounds):
        lo_expr = F.when(F.col(idx_col) == i, F.lit(0.0 if i == 0 else float(bounds[i - 1]))).otherwise(lo_expr)
        hi_expr = F.when(F.col(idx_col) == i, F.lit(float(b))).otherwise(hi_expr)
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(idx_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = (
        hist.withColumn("__cum", F.sum(count_col).over(w_cum))
        .withColumn("__total", F.sum(count_col).over(w_all))
        .withColumn("__prev", F.col("__cum") - F.col(count_col))
    )
    # first bucket whose cumulative count reaches the target rank:
    # cum*q_den >= total*q_num AND prev*q_den < total*q_num (exact ints)
    crossing = cum.where(
        (F.col("__cum") * q_den >= F.col("__total") * q_num)
        & (F.col("__prev") * q_den < F.col("__total") * q_num)
    )
    frac = (
        F.col("__total").cast("double") * F.lit(q_num / q_den)
        - F.col("__prev").cast("double")
    ) / F.col(count_col).cast("double")
    return crossing.select(
        *keys,
        F.col(idx_col),
        F.round(lo_expr + (hi_expr - lo_expr) * frac, 6).alias(
            f"p{round(1000 * q_num / q_den)}"
        ),
    )
