"""Time-interval union (merge overlapping spans per entity).

The span-coverage primitive behind "total time the service was in
state X", SLO error-window accounting, and trace-span self-time: given
per-entity intervals [start, end], merge every overlapping-or-touching
run into one island and report its extent. Classic gaps-and-islands —
a new island starts where an interval's start exceeds the running max
end of everything before it.

Plan shape: both window functions (running max end, running island
sum) share ONE partitioning (entity) and ONE ordering (start, id), so
the whole operator is a single Exchange + Sort followed by a hash
aggregate on (entity, island) — the partition-local island ids never
cross entities, so at 100 TB this scales exactly like any keyed
window. All arithmetic is integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["merge_intervals"]


def merge_intervals(
    df: DataFrame,
    by: list[str],
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Merge overlapping/touching [start, end] integer intervals per
    group. ``id_col`` breaks start-timestamp ties so the island scan
    order is total (the merge result is order-insensitive, but a total
    order keeps the plan deterministic).

    Returns one row per merged island: group cols, span_start,
    span_end, n_merged, covered (= span_end - span_start; islands are
    contiguous by construction, so extent equals covered time).
    """
    order = [F.col(start_col).asc(), F.col(id_col).asc()]
    w_scan = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn("__prev_max_end", F.max(end_col).over(w_scan)).withColumn(
        "__new_island",
        F.when(
            F.col("__prev_max_end").isNull()
            | (F.col(start_col) > F.col("__prev_max_end")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("__island", F.sum("__new_island").over(w_run))
    return (
        islands.groupBy(*by, "__island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(
            *by,
            "span_start",
            "span_end",
            "n_merged",
            (F.col("span_end") - F.col("span_start")).alias("covered"),
        )
    )
