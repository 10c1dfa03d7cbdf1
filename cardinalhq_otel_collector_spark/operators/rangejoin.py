"""Bucketed time-range join — equi-join blocking for interval predicates.

For each LEFT row, find the RIGHT rows with the same key whose timestamp
falls in ``[left.ts + lower, left.ts + upper)`` (seconds, lower < upper).
The reference's aggregation/stats processors only ever need as-of and
fixed-interval buckets, but a log-analytics user asks range questions
constantly ("events near this error"), and Spark plans a raw
``l JOIN r ON key AND r.ts BETWEEN ...`` with the inequality left as a
post-join filter on the key-equi-join — correct, but the real trap is
the keyless variant (BroadcastNestedLoopJoin) and the skewed-key
variant, where every hot key degenerates to an O(|L_k|·|R_k|) block.

Spark-first shape — bucket blocking, the standard MapReduce range-join
trick:

  1. pick a bucket width W = (upper - lower) seconds (the span), so any
     match window overlaps AT MOST two buckets;
  2. right rows get one bucket each: ``floor(ts / W)``;
  3. left rows explode to the (≤2, exactly the distinct values of)
     buckets their window ``[ts+lower, ts+upper)`` overlaps —
     ``sequence(floor((ts+lower)/W), floor((ts+upper-ε)/W))``;
  4. equi-join on ``(key, bucket)`` — a plain shuffled (or broadcast)
     hash join Catalyst and AQE handle natively — then apply the exact
     range predicate as a cheap post-filter.

Cost: ≤2× left-side explosion and ONE hash equi-join; intermediate size
is the true candidate set (rows within W of each other), never |L|·|R|.
At 100 TB the join shuffles on (key, bucket) — time-bucketing spreads a
hot key across buckets, which is exactly the salting axis you want for
telemetry keys (one noisy service no longer lands on one reducer).

Timestamps are compared in integer microseconds (``unix_micros``) so
the bucket arithmetic and the range predicate are exact — no double
rounding at epoch scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    lower: float,
    upper: float,
    left_cols: Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Inner range join: pairs where ``l.{on}+lower <= r.{on} < l.{on}+upper``.

    on: timestamp column name (present in both frames).
    by: equality key column(s) (present in both frames).
    left_cols / right_cols: payload projection (defaults: everything);
        right payload columns are emitted as ``{prefix}{col}`` (the
        right timestamp as ``{prefix}{on}``).
    lower/upper: window bounds in SECONDS relative to the left row,
        lower strictly less than upper; lower bound inclusive, upper
        exclusive.
    """
    if not lower < upper:
        raise ValueError(f"need lower < upper, got [{lower}, {upper})")
    by_cols = [by] if isinstance(by, str) else list(by)
    left_cols = list(left_cols) if left_cols is not None else [
        c for c in left.columns if c not in by_cols
    ]
    right_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in by_cols and c != on
    ]

    lo_us = int(round(lower * 1_000_000))
    hi_us = int(round(upper * 1_000_000))
    width_us = hi_us - lo_us

    def _fdiv(col, w: int):
        # exact integer floor division (cast("bigint") truncates toward
        # zero, which is wrong for pre-epoch timestamps); (col - pmod) is
        # an exact multiple of w, so the double division is exact too
        return ((col - F.pmod(col, F.lit(w))) / F.lit(w)).cast("bigint")

    r = right.select(
        *by_cols,
        F.unix_micros(F.col(on).cast("timestamp")).alias("__r_us"),
        _fdiv(F.unix_micros(F.col(on).cast("timestamp")), width_us).alias("__bkt"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.col(on).alias(f"{prefix}{on}"),
    )
    l = left.select(
        *by_cols,
        F.unix_micros(F.col(on).cast("timestamp")).alias("__l_us"),
        *[F.col(c) for c in left_cols],
    ).withColumn(
        "__bkt",
        F.explode(
            F.array_distinct(
                F.sequence(
                    _fdiv(F.col("__l_us") + F.lit(lo_us), width_us),
                    # upper bound is exclusive → last reachable micro is
                    # ts+upper-1; the window spans exactly one bucket
                    # width, so it never overlaps a third bucket
                    _fdiv(F.col("__l_us") + F.lit(hi_us - 1), width_us),
                )
            )
        ),
    )
    joined = l.join(r, on=[*by_cols, "__bkt"], how="inner").filter(
        (F.col("__r_us") >= F.col("__l_us") + F.lit(lo_us))
        & (F.col("__r_us") < F.col("__l_us") + F.lit(hi_us))
    )
    return joined.drop("__bkt", "__l_us", "__r_us")
