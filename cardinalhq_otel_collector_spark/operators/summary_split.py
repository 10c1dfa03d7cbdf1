"""A7 — Summary-metric split/explode (processor/summarysplitprocessor).

Reference semantics (summarysplitprocessor/metrics.go:27-198, goldens in
metrics_test.go:28-200):

  Summary{name, count, sum, quantiles[]} →
    <name>.count   value=count clamped to int64 max    (metrics.go:118-123)
    <name>.sum     value=sum                           (metrics.go:127-143)
    per quantile q:
      q == 0   → <name>.min
      q == 1   → <name>.max
      else     → <name>.quantile.<pct> with '.'→'_'  (0.999 → quantile.99_9)
      NaN / Inf / q outside [0,1] skipped              (metrics.go:152-156)
    StartTimestamp := Timestamp when 0                 (metrics.go:179-184)

Pure projection + explode — fully vectorized, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_suffix", "summary_split"]

_I64_MAX = 2**63 - 1


def quantile_suffix(q: Column) -> Column:
    """0→'min', 1→'max', else 'quantile.<pct>' with '.'→'_'.

    pct = q*100 rendered without trailing zeros (metrics.go:188-198:
    strconv.FormatFloat(q*100, 'f', -1, 64) then '.'→'_').
    """
    pct = q * 100
    # Render like Go's FormatFloat(-1): integral → no decimal point.
    pct_str = F.when(
        pct == F.floor(pct), pct.cast("long").cast("string")
    ).otherwise(F.regexp_replace(pct.cast("string"), r"\.?0+$", ""))
    return (
        F.when(q == 0.0, F.lit("min"))
        .when(q == 1.0, F.lit("max"))
        .otherwise(F.concat(F.lit("quantile."), F.regexp_replace(pct_str, r"\.", "_")))
    )


def summary_split(df: DataFrame) -> DataFrame:
    """Explode summary rows → (metric, value, value_is_int, ts_ms, start_ts_ms).

    Input schema: name, count:long, sum:double,
    quantiles:array<struct<q:double,v:double>>, ts_ms:long, start_ts_ms:long.
    """
    start = F.when(F.col("start_ts_ms") == 0, F.col("ts_ms")).otherwise(F.col("start_ts_ms"))
    base = df.withColumn("start_ts_ms", start)

    count_rows = base.select(
        F.concat("name", F.lit(".count")).alias("metric"),
        F.least(F.col("count"), F.lit(_I64_MAX)).cast("double").alias("value"),
        F.lit(True).alias("value_is_int"),
        "ts_ms",
        "start_ts_ms",
    )
    sum_rows = base.select(
        F.concat("name", F.lit(".sum")).alias("metric"),
        F.col("sum").alias("value"),
        F.lit(False).alias("value_is_int"),
        "ts_ms",
        "start_ts_ms",
    )
    q = base.select("name", "ts_ms", "start_ts_ms", F.explode("quantiles").alias("qv"))
    qcol = F.col("qv.q")
    q_rows = (
        q.filter(~F.isnan(qcol) & (qcol >= 0.0) & (qcol <= 1.0))
        .select(
            F.concat("name", F.lit("."), quantile_suffix(qcol)).alias("metric"),
            F.col("qv.v").alias("value"),
            F.lit(False).alias("value_is_int"),
            "ts_ms",
            "start_ts_ms",
        )
    )
    return count_rows.unionByName(sum_rows).unionByName(q_rows)
