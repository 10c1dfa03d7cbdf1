"""As-of (most-recent-preceding) join — a time-series primitive Spark
lacks natively.

For each LEFT row, attach the RIGHT row with the greatest timestamp
``<=`` the left timestamp, per key (backward as-of; same semantics as
DuckDB's ``ASOF LEFT JOIN``, which the oracle uses).

Spark-first shape — the union + window trick, NOT a join:

  1. tag both sides and union them (right rows carry their payload in a
     struct, left rows carry null),
  2. one window per key ordered by (ts, side-tag): ``last(payload,
     ignorenulls=True)`` over unbounded-preceding..current rows picks
     exactly the most recent right row at-or-before each left row,
  3. keep the left rows and unpack the struct.

Cost: ONE shuffle+sort on the key — no range-join explosion, no
per-left-row subquery. A naive ``l JOIN r ON key AND r.ts <= l.ts``
followed by argmax materializes O(|L|·avg-preceding-rows) intermediate
rows and dies at corpus scale; this stays linear in |L|+|R|. Skewed
keys behave like any windowed agg (salt upstream if one key dominates).

The right side sorts BEFORE left at equal timestamps (``<=``
semantics), and ties among right rows at the same (key, ts) are broken
by the highest ``right_order`` column so results are deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_payload: Sequence[str],
    right_order: str | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    on: timestamp column name (present in both frames).
    by: equality key column(s) (present in both frames).
    right_payload: right columns to attach, each emitted as
        ``{prefix}{col}``; ``{prefix}{on}`` (the matched timestamp) is
        always attached. Left rows with no preceding right row keep
        nulls.
    right_order: deterministic tiebreak among right rows sharing
        (by, on) — the row with the HIGHEST value wins. Defaults to the
        first payload column.
    tolerance_seconds: if set, matches older than ``on - tolerance``
        are nulled out (pandas merge_asof tolerance semantics).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    right_order = right_order or right_payload[0]

    payload = F.struct(
        F.col(on).alias(on), *[F.col(c).alias(c) for c in right_payload]
    )
    r = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(right_order).cast("double").alias("__ord"),
        payload.alias("__p"),
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__ord", F.lit(None).cast("double")
    ).withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))

    merged = l.select(*[F.col(c) for c in l.columns]).unionByName(
        r.select(*by_cols, on, "__side", "__ord", "__p"),
        allowMissingColumns=True,
    )
    # Right rows (side 0) sort before left rows (side 1) at equal ts →
    # "<=" semantics; among right ties the highest __ord sorts last and
    # is what last() sees.
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__ord").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("__match", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__ord", "__p")
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col(on).cast("double") - F.col(f"__match.{on}").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        out = out.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )
    out = out.withColumn(f"{prefix}{on}", F.col(f"__match.{on}"))
    for c in right_payload:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__match.{c}"))
    return out.drop("__match")
