"""Group-assembly operators (SURVEY.md §2B "grouping"):

  groupbytraceprocessor  — buffer a whole trace/conversation, emit it as
                           one ordered unit (manifest :249)
  groupbyattrsprocessor  — regroup rows under a promoted key (:248)

The reference buffers traces in memory with a timeout; the relational
equivalent is a groupBy + ordered collect_list — one shuffle on the group
key, order restored inside the group by an explicit sort key (so the
result is independent of input partitioning, which the buffering
implementation is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["assemble_ordered", "group_by_attrs", "pivot_counts"]


def assemble_ordered(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    payload_col: str,
    out_col: str = "seq",
    sep: str = ",",
) -> DataFrame:
    """One row per group: count + the payload values joined in stable
    (order_cols) order. array_sort over (order keys, payload) structs makes
    the sequence deterministic under any partitioning."""
    s = F.struct(*[F.col(c) for c in order_cols], F.col(payload_col))
    ordered = F.array_sort(F.collect_list(s))
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(ordered, lambda x: x[payload_col]), sep
        ).alias(out_col),
    )


def group_by_attrs(df: DataFrame, keys: list[str], num_partitions: int | None = None) -> DataFrame:
    """groupbyattrsprocessor analogue: co-locate rows sharing the promoted
    key columns (a repartition, so downstream per-key work is local)."""
    cols = [F.col(k) for k in keys]
    return df.repartition(num_partitions, *cols) if num_partitions else df.repartition(*cols)


def pivot_counts(
    df: DataFrame,
    row_key,
    pivot_col: str,
    categories: list[str],
) -> DataFrame:
    """Crosstab: one output row per ``row_key`` value, one BIGINT count
    column per ``categories`` entry (0-filled, never null).

    ``categories`` is REQUIRED, not inferred: an inferred pivot runs an
    extra distinct-collect job over the corpus and makes the output
    schema data-dependent — at 100 TB both are bugs, not conveniences.
    With explicit categories this is one hash aggregate (map-side
    combinable conditional counts), no pivot-discovery pass, and the
    plan is a plain two-phase agg.
    """
    keys = [row_key] if isinstance(row_key, str) else list(row_key)
    return df.groupBy(*keys).agg(
        *[
            F.count(F.when(F.col(pivot_col) == c, 1)).alias(c)
            for c in categories
        ]
    )
