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
from pyspark.sql.window import Window

__all__ = ["skew_report", "psi_drift", "gini_coefficient"]


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


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    bounds: list[float],
) -> DataFrame:
    """Population Stability Index terms between two snapshots of a
    value distribution over explicit bucket bounds — the standard
    ML-ops drift alarm (PSI > 0.2 = retrain). Per bucket:
    (p_new - p_old) * ln(p_new / p_old), with counts Laplace-smoothed
    by +1 so empty buckets stay finite (the conventional guard).

    Exactness: bucket counts are integers; each term is ONE fixed IEEE
    tree over (count+1)/(total+nbuckets) ratios, rounded to 6 places —
    the pmi_collocations discipline. Two aggregates over bucket-indexed
    projections (both map-side combined), a tiny full outer join on the
    bucket id. The comparison-ladder bucketing reuses
    histogram.bucket_index, so drift bins match the histograms already
    emitted.
    """
    from cardinalhq_otel_collector_spark.operators.histogram import bucket_index

    nb = len(bounds) + 1  # + overflow bucket

    def _counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(bucket_index(F.col(value_col), bounds).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    o = _counts(old, "n_old")
    n = _counts(new, "n_new")
    t_old = old.count()  # control-plane scalars (two tiny actions)
    t_new = new.count()
    j = (
        o.join(n, "bucket", "full_outer")
        .withColumn("n_old", F.coalesce("n_old", F.lit(0)))
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
    )
    p_old = (F.col("n_old") + 1).cast("double") / F.lit(float(t_old + nb))
    p_new = (F.col("n_new") + 1).cast("double") / F.lit(float(t_new + nb))
    return j.select(
        "bucket",
        "n_old",
        "n_new",
        F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias("psi_term"),
    )


def gini_coefficient(
    df: DataFrame,
    key_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Load-imbalance as a single number: the Gini coefficient of the
    per-key row-count distribution (0 = perfectly even partitions,
    →1 = one key owns everything) — the summary statistic beside
    skew_report's top-k detail, and the trigger for the library's
    salting/AQE mitigations.

    FULLY integer-exact: with the per-key counts x_1 <= ... <= x_n,
    Gini = Σ(2i − n − 1)·x_i / (n·Σx) — numerator and denominator are
    exact BIGINT sums, rendered as ppm via integer division. The rank
    window runs over the distinct-key counts (vocabulary-sized), never
    the raw rows.
    """
    group_cols = group_cols or []
    counts = df.groupBy(*group_cols, *key_cols).agg(F.count(F.lit(1)).alias("__x"))
    order = [F.col("__x").asc()] + [F.col(c).asc() for c in key_cols]
    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    w = w.orderBy(*order)
    ranked = counts.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__x").alias("total_rows"),
        F.sum(
            (F.lit(2) * F.col("__i") - F.lit(1)) * F.col("__x")
        ).alias("__num_part"),
    )
    # gini numerator: Σ(2i − n − 1)x = Σ(2i − 1)x − n·Σx
    return agg.select(
        *group_cols,
        "n_keys",
        "total_rows",
        F.expr(
            "(__num_part - n_keys * total_rows) * 1000000"
            " div (n_keys * total_rows)"
        ).alias("gini_ppm"),
    )
