"""exceptionsconnector analogue (manifest :276): roll exception/error
records up into per-group metrics plus a deterministic exemplar.

The reference emits `exceptions` count metrics dimensioned by service/span
attrs and an exemplar per group; relationally that's filter → groupBy →
count + min-by exemplar — one hash aggregation, shuffle bounded by group
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exceptions_rollup"]


def exceptions_rollup(
    df: DataFrame,
    error_predicate: str,
    keys: list[str],
    message_col: str,
    interval: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """(keys, bucket_start, n_exceptions, exemplar) per interval.

    The exemplar is the lexicographically-first message (min) — stable
    under any partitioning, unlike the reference's first-seen exemplar
    which depends on arrival order.
    """
    errs = df.filter(F.expr(error_predicate))
    return (
        errs.groupBy(F.window(ts_col, interval).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_exceptions"),
            F.min(message_col).alias("exemplar"),
        )
        .withColumn("bucket_start", F.col("w.start"))
        .drop("w")
    )
