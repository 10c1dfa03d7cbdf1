"""Ordered-funnel analysis — earliest strictly-ordered completion of a
step sequence per entity.

The log-analytics question "of the users who did A, how many went on to
do B, then C, within T?" (ClickHouse ``windowFunnel``, Amplitude-style
funnels). For each entity the answer is a chain of argmins: ``t1`` =
earliest A; ``t2`` = earliest B **after** ``t1``; ``t3`` = earliest C
after ``t2``; all within ``t1 + within``.

Spark-first shape — chained running-min window projections, NOT k
self-joins and NOT a per-entity ``collect_list``:

  1. one window spec per entity ordered by (ts, tiebreak);
  2. ``running1 = min(ts WHERE step=A) over unbounded-preceding`` — for
     every row at/after the earliest A this equals the global earliest A
     (ordering is by ts, so the first A in window order IS the argmin);
  3. ``flag2 = ts WHERE step=B AND ts > running1 (AND ts <= running1 +
     within)``, then ``running2 = min(flag2) over the same frame`` —
     each projection may reference the previous window result; Catalyst
     plans ALL of them over a single Exchange+Sort because the
     partitioning and ordering are identical;
  4. a final per-entity groupBy takes the overall min of each flag
     column (map-side combinable).

Cost: ONE shuffle+sort on the entity key + one hash agg, linear in the
event count — no join blowup, no per-entity array materialization (a
hot entity with 10^8 events would OOM a collect_list; here it is just a
long sorted run). Strict ``>`` uses the timestamp only, so two events
in the same microsecond cannot chain — the conservative reading, and
the one a pure-SQL oracle reproduces exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    by: str,
    step_col: str,
    ts_col: str = "ts",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-entity funnel: one row per entity that completed step 1.

    Output: ``{by}``, ``step1_ts .. stepK_ts`` (null once the chain
    breaks), ``steps_completed`` (int, >= 1).

    within_seconds: if set, every later step must land at or before
    ``step1_ts + within_seconds`` (window anchored at the first step,
    ClickHouse windowFunnel semantics).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = df.select(by, step_col, ts_col).withColumn(
        "__r1",
        F.min(F.when(F.col(step_col) == steps[0], F.col(ts_col))).over(w),
    )
    deadline = None
    if within_seconds is not None:
        us = int(round(within_seconds * 1_000_000))
        deadline = F.unix_micros(F.col("__r1").cast("timestamp")) + F.lit(us)
    prev = "__r1"
    for i, step in enumerate(steps[1:], start=2):
        cond = (F.col(step_col) == step) & (F.col(ts_col) > F.col(prev))
        if deadline is not None:
            cond = cond & (F.unix_micros(F.col(ts_col).cast("timestamp")) <= deadline)
        # each running-min references the previous one: a new projection,
        # but the identical (partitionBy, orderBy) means one Exchange+Sort
        cur = cur.withColumn(
            f"__r{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"__r{i}"
    agg = cur.groupBy(by).agg(
        *[
            F.min(f"__r{i}").alias(f"step{i}_ts")
            for i in range(1, len(steps) + 1)
        ]
    )
    completed = F.lit(0)
    for i in range(1, len(steps) + 1):
        completed = completed + F.when(
            F.col(f"step{i}_ts").isNotNull(), 1
        ).otherwise(0)
    return agg.filter(F.col("step1_ts").isNotNull()).withColumn(
        "steps_completed", completed.cast("int")
    )
