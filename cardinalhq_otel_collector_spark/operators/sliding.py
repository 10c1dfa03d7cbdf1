"""Per-row sliding time-window aggregates — RANGE-frame windows, the
sort-based cousin of :mod:`rangejoin`.

"How many events did this key produce in the trailing N minutes, as of
every event?" is the telemetry question behind rate alerts, burst
detection, and the reference's rate/stats processors when they are
asked for trailing (not tumbling) windows.

Spark-first shape: ``Window.partitionBy(key).orderBy(unix_micros(ts))
.rangeBetween(-N·1e6, 0)`` — a RANGE frame over the integer-microsecond
epoch. One shuffle + one sort per key, zero joins: when the aggregate
is wanted per row of the SAME stream, this beats the bucketed
range-join (which exists for the two-stream case) because the frame
walk is a linear two-pointer scan inside each sorted partition.

RANGE frames treat equal timestamps as peers — every row in the same
microsecond sees the identical window, so no tiebreak column is needed
and the result is deterministic by construction (ANSI semantics both
engines implement identically; the oracle uses DuckDB's RANGE frame
over the same ``epoch_us`` ordering).

At 100 TB: the shuffle carries the raw stream once; partitions are
per-key event runs (bounded by key activity). A pathologically hot key
behaves like any skewed window — salt upstream, or pre-aggregate to
coarse buckets first when per-row granularity isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sliding_window_agg"]


def sliding_window_agg(
    df: DataFrame,
    by: str,
    ts_col: str = "ts",
    window_seconds: int = 600,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Attach trailing-window aggregates to every row.

    aggs: output-name → aggregate Column (built from ``F.*``); default
    ``{"n_window": F.count(F.lit(1))}``. Every aggregate is evaluated
    over ``[ts - window_seconds, ts]`` (both ends inclusive — RANGE
    frame) within the ``by`` key.
    """
    us = int(window_seconds) * 1_000_000
    w = (
        Window.partitionBy(by)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-us, 0)
    )
    aggs = aggs or {"n_window": F.count(F.lit(1))}
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out
