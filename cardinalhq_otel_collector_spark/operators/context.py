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

__all__ = ["trim_to_budget"]


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
