"""Count-min sketch frequency estimation.

The bounded-memory counterpart to exact grouped counts
(sampling.heavy_hitters): a depth x width counter grid whose cells are
additive — partial grids merge by cell-wise sum, which is exactly
Spark's map-side partial aggregation, so the shuffle carries at most
depth*width rows per partition NO MATTER how many distinct keys exist.
At 100 TB an exact per-key count of a high-cardinality key (URLs, span
ids) shuffles billions of groups; the sketch shuffles a few thousand
cells. Estimates are upper bounds: est >= true, with overshoot bounded
by collisions (Cormode & Muthukrishnan 2005).

Determinism contract: row-i hash is the 52-bit md5 prefix of
"i|key" modulo width — reproducible verbatim in any engine with md5
(the DuckDB oracle rebuilds the identical grid and takes the identical
min), same discipline as sketch.kmv_distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_counts"]


def _cell(i_col, key_col, width: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(i_col.cast("string"), F.lit("|"), key_col.cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_counts(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate per-key row counts from a depth x width count-min grid.

    Plan shape: one explode (depth rows per input row) into a
    (row, cell) grouped count — the grid, at most depth*width rows,
    with map-side combine doing the heavy lifting — then a broadcast
    join from the distinct keys' (row, cell) coordinates back onto the
    grid and a min across rows. The only data-sized shuffle is the
    distinct-keys one; the grid itself is constant-size.

    Returns (key, est_n) with est_n >= the true count.
    """
    keyed = df.where(F.col(key_col).isNotNull()).select(F.col(key_col).alias("key"))
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i")
    grid = (
        keyed.select("key", rows)
        .select("i", _cell(F.col("i"), F.col("key"), width).alias("cell"))
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probes = keyed.distinct().select("key", rows).select(
        "key", "i", _cell(F.col("i"), F.col("key"), width).alias("cell")
    )
    return (
        probes.join(F.broadcast(grid), ["i", "cell"])
        .groupBy("key")
        .agg(F.min("n").alias("est_n"))
        .withColumnRenamed("key", key_col)
    )
