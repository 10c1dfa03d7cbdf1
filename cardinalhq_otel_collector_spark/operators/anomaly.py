"""Rolling z-score anomaly detection over bucketed series — the
lightweight statistical counterpart to the reference's
isolationforestprocessor (cardinalhq-otel-collector.yaml:251, out of
scope per SURVEY): score each (entity, time-bucket) observation
against the trailing-window mean/stddev of its own series and flag
|z| > threshold (log-volume spikes, drops, error-rate bursts).

Numeric discipline: the rolling statistics are built from INTEGER
rolling sums (count, sum, sum-of-squares over a ROWS frame) and the
mean/variance/z are derived in one fixed IEEE expression tree —
identical inputs therefore produce bit-identical doubles in any
engine that evaluates the same tree (the DuckDB oracle does), unlike
built-in stddev aggregates whose accumulation algorithm (Welford vs
naive, order) is engine-private.

Shape at scale: the heavy input collapses through ONE count
aggregation (map-side partial combine); everything downstream —
spine densify, rolling window — runs over bucket-grain rows
(entities x hours), which is dimension-sized even at 100 TB of raw
events. The rolling window partitions by entity and orders by
bucket: one small shuffle, bounded partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucket_counts", "rolling_zscore", "theil_sen_trend"]


def bucket_counts(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str = "ts",
    granularity: str = "hour",
    densify: bool = False,
    out_bucket_col: str = "bucket_start",
    out_count_col: str = "n",
) -> DataFrame:
    """Per-entity event counts per time bucket.

    ``densify=True`` fills buckets with no events as explicit n=0 rows
    over each entity's [min, max] bucket span — a volume DROP (outage)
    is then a scoreable observation instead of a missing row. The fill
    is a single-lineage gap-fill: a lag() window per entity finds each
    row's predecessor bucket and the row explodes into [missing
    zero-buckets since predecessor..., itself]. No per-entity spine
    dimension, no left join, and — the part that matters at 100 TB —
    the count aggregate is computed ONCE (a spine+join formulation
    references the aggregate twice, and AQE does not reuse the
    exchange, so the raw scan runs twice — measured before this
    formulation replaced it). The gap-fill window partitions on the
    entity key, the same partitioning the downstream rolling-zscore
    window needs, so it adds one Exchange total.
    """
    step = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}[granularity]
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias(out_bucket_col)
    counts = df.groupBy(*entity_cols, bucket).agg(
        F.count(F.lit(1)).alias(out_count_col)
    )
    if not densify:
        return counts
    step_i = F.expr(f"INTERVAL {step}")
    w = Window.partitionBy(*entity_cols).orderBy(out_bucket_col)
    # window expressions can't sit inside a generator — project prev first
    counts = counts.withColumn("__prev", F.lag(out_bucket_col).over(w))
    prev = F.col("__prev")
    cur = F.col(out_bucket_col)
    gap = F.when(
        prev.isNotNull() & (cur > prev + step_i),
        F.sequence(prev + step_i, cur - step_i, step_i),
    ).otherwise(F.array().cast("array<timestamp>"))
    cells = F.concat(
        F.transform(
            gap,
            lambda b: F.struct(
                b.alias(out_bucket_col),
                F.lit(0).cast("long").alias(out_count_col),
            ),
        ),
        F.array(
            F.struct(
                cur.alias(out_bucket_col),
                F.col(out_count_col).alias(out_count_col),
            )
        ),
    )
    return counts.select(
        *entity_cols, F.explode(cells).alias("__cell")
    ).select(
        *entity_cols,
        F.col(f"__cell.{out_bucket_col}").alias(out_bucket_col),
        F.col(f"__cell.{out_count_col}").alias(out_count_col),
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    entity_cols: list[str],
    order_col: str,
    lookback: int = 24,
    min_lookback: int = 12,
    threshold: float = 3.0,
    out_col: str = "zscore",
) -> DataFrame:
    """Score each row against the trailing ``lookback`` rows of its
    entity's series (ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING —
    the current observation never contaminates its own baseline).

    Adds ``out_col`` (double, NULL when the baseline has fewer than
    ``min_lookback`` observations or zero variance) and ``is_anomaly``
    (boolean, NULL exactly when the z-score is NULL). ``value_col``
    must be integral so the rolling sums are exact.
    """
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col)
    cnt = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    # fixed IEEE tree: var_samp = (ss - s*s/cnt) / (cnt-1); one
    # subtraction, two divisions, evaluated on exact integer inputs
    var = (ss.cast("double") - s.cast("double") * s / cnt) / (cnt - 1)
    mean = s.cast("double") / cnt
    z = F.when(
        (cnt >= F.lit(min_lookback)) & (var > F.lit(0.0)),
        (v - mean) / F.sqrt(var),
    )
    return df.withColumn(out_col, z).withColumn(
        "is_anomaly",
        F.when(z.isNotNull(), F.abs(z) > F.lit(threshold)),
    )


def theil_sen_trend(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Robust per-series trend: the Theil-Sen estimator (median of all
    pairwise slopes) — up to ~29% of the points can be arbitrary
    outliers without moving the estimate, unlike least squares (Sen
    1968). The 'is this gauge actually drifting' answer that a spike
    can't fake.

    Pairs form WITHIN each series, so the cost is O(n_i²) per
    series, never corpus². That is the honest complexity of Theil-Sen;
    at 100 TB you run it on gauge-sized series (thousands of points) or
    decimate/changes_only upstream first — both already in this
    library. Slopes are per-hour: one fixed IEEE tree per pair
    ((dv/dt_us)·3.6e9), median via the exact-percentile round-6
    discipline.

    Round-6 note (guide §1.1 — empirical beats first-principles): an
    array formulation (collect each series sorted, form slopes with
    nested SQL lambdas, one shuffle) was built and measured head-to-head
    at the sf1.0 bench: 8.4s vs 5.3s for this join — HOF lambdas are
    interpreted per element while the join+percentile path is fully
    codegen'd, so once the input scan is spread across cores (the round-6
    ``_read`` respread) the join formulation wins. Kept as-is.
    """
    base = df.select(
        *by,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.col(value_col).alias("__v"),
        F.col(id_col).alias("__id"),
    )
    a = base
    b = base.select(
        *[F.col(c).alias(f"{c}__b") for c in by],
        F.col("__t").alias("__t2"),
        F.col("__v").alias("__v2"),
        F.col("__id").alias("__id2"),
    )
    cond = None
    for c in by:
        eq = a[c] == b[f"{c}__b"]
        cond = eq if cond is None else (cond & eq)
    # strict (t, id) order makes each unordered pair appear exactly once
    cond = cond & (
        (a["__t"] < b["__t2"])
        | ((a["__t"] == b["__t2"]) & (a["__id"] < b["__id2"]))
    )
    pairs = a.join(b, cond).where(F.col("__t2") != F.col("__t"))
    slope_ph = (
        (F.col("__v2") - F.col("__v"))
        / (F.col("__t2") - F.col("__t")).cast("double")
        * F.lit(3600000000.0)
    )
    return (
        pairs.select(*by, slope_ph.alias("__s"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.percentile(F.col("__s"), F.lit(0.5)), 6).alias(
                "slope_per_hour"
            ),
        )
    )
