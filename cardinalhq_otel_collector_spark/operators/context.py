"""Context-window budget trimming for conversation transcripts.

The serving-side sibling of packing.pack_sequences: given per-turn
token counts and a budget B, keep the LONGEST SUFFIX of each
conversation whose total fits B — the "most recent context" rule every
chat runtime applies before inference. A turn survives iff the sum of
its own tokens plus everything after it is <= B — i.e. a turn drops
exactly when the suffix it starts exceeds B (greedy-from-the-end, the
standard rule; an oversized recent turn therefore evicts all older
context including itself only if it alone exceeds B).

One Exchange: the reverse cumulative sum is a window over (conv,
order DESC), and the filter is a projection on it. Integer-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["trim_to_budget", "context_window"]


def trim_to_budget(
    df: DataFrame,
    conv_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Rows whose suffix-total (this turn + all later turns) fits the
    token budget; emits the suffix total alongside."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("suffix_tokens", F.sum(tokens_col).over(w))
        .where(F.col("suffix_tokens") <= budget)
    )


def context_window(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    id_col: str,
    payload_col: str,
    k: int = 3,
) -> DataFrame:
    """Last-k preceding payloads per row ('what happened just before
    this event') — the context-gathering primitive behind error
    triage and few-shot example assembly. A ROWS window (k PRECEDING
    .. 1 PRECEDING) over the (ts, id) order; collect_list inside a
    window frame preserves the frame's order, so the joined context
    string is deterministic under any partitioning. One Exchange+Sort.
    """
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-k, -1)
    )
    return df.withColumn(
        "context", F.array_join(F.collect_list(payload_col).over(w), ",")
    )
