"""Keyed snapshot diff (CDC-style compare of two table versions).

The reconciliation primitive for incremental pipelines: given an old
and a new snapshot sharing a key, classify every key as added /
removed / changed (unchanged keys are dropped — at 100 TB the output
is the delta, which is what downstream consumers replay). One full
outer hash join on the key — both sides shuffle once, AQE handles
skew; the column comparison is null-safe (`eqNullSafe`), so NULL ->
value and value -> NULL both count as changes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """One row per key whose presence or compared columns differ:
    (keys..., status in {'added','removed','changed'}). Key presence is
    tracked with literal flags (never NULL-ambiguous when compared
    columns are themselves NULL)."""
    o = old.select(*key_cols, *compare_cols, F.lit(1).alias("__in_old"))
    n = new.select(*key_cols, *compare_cols, F.lit(1).alias("__in_new"))
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"__o_{c}")
        n = n.withColumnRenamed(c, f"__n_{c}")
    j = o.join(n, key_cols, "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols],
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
