"""Stateful / ordered operators — the window-function-shaped processors
(SURVEY.md §2B "Stateful / ordered"):

  cumulativetodeltaprocessor   v[i] - v[i-1] per series      (manifest :240)
  deltatocumulativeprocessor   running sum per series        (:242)
  deltatorateprocessor         delta / Δt                    (:243)
  metricstarttimeprocessor     fill StartTimestamp first-seen (:255)
  intervalprocessor            last value per interval       (:250)

All are single ``Window.partitionBy(series).orderBy(ts)`` passes — one
shuffle on the series key, sort within partition, codegen'd window exec.
At scale the partition key is the series identity (bounded cardinality per
partition), so no executor ever materializes more than one series run.
Ordering ties are broken by an explicit tiebreaker column so results are
deterministic under any input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cumulative_to_delta",
    "delta_to_cumulative",
    "delta_to_rate",
    "fill_start_time",
    "interval_last",
]


def _w(series: list[str], ts_col: str, tiebreak: list[str]):
    return Window.partitionBy(*series).orderBy(F.col(ts_col), *[F.col(c) for c in tiebreak])


def cumulative_to_delta(
    df: DataFrame, series: list[str], value_col: str,
    ts_col: str = "ts", tiebreak: list[str] = (), out_col: str = "delta",
) -> DataFrame:
    w = _w(series, ts_col, list(tiebreak))
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))


def delta_to_cumulative(
    df: DataFrame, series: list[str], value_col: str,
    ts_col: str = "ts", tiebreak: list[str] = (), out_col: str = "cumulative",
) -> DataFrame:
    w = _w(series, ts_col, list(tiebreak)).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def delta_to_rate(
    df: DataFrame, series: list[str], value_col: str,
    ts_col: str = "ts", tiebreak: list[str] = (), out_col: str = "rate",
) -> DataFrame:
    """delta / Δt(seconds). Uses microsecond-exact timestamps so the value
    is reproducible bit-for-bit across engines."""
    w = _w(series, ts_col, list(tiebreak))
    # cast: parquet timestamps may arrive as TIMESTAMP_NTZ, which
    # unix_micros rejects (session TZ is pinned UTC so the cast is exact)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt_us = us - F.lag(us).over(w)
    return df.withColumn(
        out_col,
        (F.col(value_col) - F.lag(value_col).over(w)) / (dt_us.cast("double") / 1e6),
    )


def fill_start_time(
    df: DataFrame, series: list[str], ts_col: str = "ts", out_col: str = "start_ts",
) -> DataFrame:
    w = Window.partitionBy(*series)
    return df.withColumn(out_col, F.min(ts_col).over(w))


def interval_last(
    df: DataFrame, series: list[str], value_col: str,
    interval: str = "60 seconds", ts_col: str = "ts", tiebreak: list[str] = (),
) -> DataFrame:
    """intervalprocessor: one row per (series, interval) keeping the last
    value — groupBy + max_by, a single hash aggregation (no sort)."""
    order = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak])
    return (
        df.groupBy(F.window(ts_col, interval).alias("w"), *series)
        .agg(
            F.max_by(F.col(value_col), order).alias("last_value"),
            F.max(ts_col).alias("last_ts"),
        )
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )
