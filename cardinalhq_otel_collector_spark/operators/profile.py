"""Join/aggregation-key skew diagnostics.

The pre-flight check before any big keyed operation at 100 TB: a
shuffle is only as fast as its largest key, so you want the key
histogram BEFORE launching the join — which keys dominate, what share
of all rows they hold, and what salt factor would level them onto the
target per-task row budget (the salt the pipeline's optional
skew-salting already accepts). One distinct-key aggregate (map-side
combined) + a one-row total joined back broadcast; the top cut is
TakeOrdered (never a single-partition global sort). All outputs are
exact integers: share in ppm and the salt factor use integer division
so the report is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_report"]


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    target_rows_per_task: int = 1_000_000,
    top: int = 10,
) -> DataFrame:
    """Top-``top`` keys by row count with integer share (ppm of all
    rows) and the recommended salt factor ceil(n / target). Ties break
    on the key columns ascending so the cut is unique."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    t = int(target_rows_per_task)
    report = (
        counts.join(F.broadcast(total))
        .select(
            *key_cols,
            "n",
            F.expr("n * 1000000 div __total").alias("share_ppm"),
            F.expr(f"(n + {t - 1}) div {t}").alias("salt_factor"),
        )
    )
    return report.orderBy(
        F.col("n").desc(), *[F.col(c).asc() for c in key_cols]
    ).limit(top)
