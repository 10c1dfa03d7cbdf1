"""Sequence packing (training-data pipeline op).

Pretraining pipelines concatenate documents in a deterministic order
into one token stream and chunk it into fixed-size training sequences;
each document therefore has a start offset in the stream and a bin
(sequence) index — documents may straddle bin boundaries, exactly like
the concatenate-and-chunk packing used for LM training.

The naive Spark expression — ``SUM(n) OVER (ORDER BY id)`` — collapses
to a SINGLE partition (a global ordered window) and dies at corpus
scale. This implements the scalable two-phase prefix sum:

  1. per-BUCKET running sum: a window partitioned by a caller-supplied
     bucket that is monotone in the order key (e.g. ``doc_id // 64``,
     or a date partition) — full parallelism, one shuffle;
  2. bucket start offsets: prefix-sum over the one-row-per-bucket
     totals frame (control-plane sized — a single-partition window over
     thousands of rows, not billions), broadcast-joined back.

The result is byte-identical to the global cumsum as long as the
bucket is monotone in the order key: (bucket, id) order == id order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    target_tokens: int,
    bucket_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: token count, start offset in the concatenated
    stream (ordered by ``bucket_col, id_col``), and the bin index
    ``start_offset // target_tokens``.

    bucket_col MUST be monotone non-decreasing in id_col (e.g.
    ``F.floor(F.col("doc_id") / 64)`` materialized by the caller) —
    that is what makes the two-phase sum equal the global one.
    Tokens are single-space splits (engine-portable; swap in a real
    tokenizer count upstream if available).
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = df.select(F.col(id_col), F.col(bucket_col), n_tok.alias("n_tokens"))

    w_in = (
        Window.partitionBy(bucket_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__local_end", F.sum("n_tokens").over(w_in))

    totals = base.groupBy(bucket_col).agg(F.sum("n_tokens").alias("__btot"))
    w_b = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col(bucket_col),
        F.coalesce(F.sum("__btot").over(w_b), F.lit(0)).alias("__boff"),
    )

    return (
        local.join(F.broadcast(offsets), bucket_col)
        .withColumn(
            "start_offset", F.col("__boff") + F.col("__local_end") - F.col("n_tokens")
        )
        .withColumn(
            "bin_id", F.floor(F.col("start_offset") / target_tokens).cast("long")
        )
        .select(id_col, "n_tokens", "start_offset", "bin_id")
    )
