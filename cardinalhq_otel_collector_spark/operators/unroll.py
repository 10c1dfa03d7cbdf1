"""unrollprocessor analogue (manifest :267): explode array-valued bodies
into one row per element — a pure JVM explode, no shuffle.

The reference unrolls a log body that is a slice into one LogRecord per
element (unrollprocessor); here any array column unrolls the same way,
optionally keeping the element index (the reference preserves ordering
implicitly by emission order; a distributed engine must carry it as data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["unroll", "unroll_with_index"]


def unroll(df: DataFrame, array_col: Column | str, out_col: str) -> DataFrame:
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return df.withColumn(out_col, F.explode(col))


def unroll_with_index(
    df: DataFrame, array_col: Column | str, out_col: str, idx_col: str = "element_idx"
) -> DataFrame:
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return df.select("*", F.posexplode(col).alias(idx_col, out_col))
