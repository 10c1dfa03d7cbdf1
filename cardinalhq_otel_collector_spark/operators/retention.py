"""Cohort retention — the standard activity-over-time rollup for an
event/transcript stream: bucket each user into the cohort of their
first-ever active week, then count distinct users per (cohort, week
offset). week 0 row = cohort size; retention curves divide offsets by
it downstream.

Exact integer analytics end to end (week buckets are ISO-Monday
date_trunc in every engine; offsets are day-difference floor-division
by 7), so an independent engine reproduces every count bit-for-bit.

Shape at scale: two hash aggregates over (user, week) — both with
map-side combine, shuffles carry distinct pairs — and one join of the
activity pairs against the per-user cohort (user-cardinality side;
AQE broadcasts when it fits, shuffle-join on user otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cohort_retention", "new_user_curve"]


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): distinct active users per
    weekly offset from their cohort (first active) week."""
    week = F.date_trunc("week", F.col(ts_col)).alias("w")
    activity = df.select(F.col(user_col), week).distinct()
    # per-user first week as a window over the distinct activity pairs —
    # the previous groupBy+self-join referenced ``activity`` twice, so
    # the scan+distinct chain planned (and could run) twice (guide §2.4);
    # min over the same pairs is the identical cohort week
    wu = Window.partitionBy(user_col)
    return (
        activity.withColumn("cohort_week", F.min("w").over(wu))
        .withColumn(
            "week_offset",
            F.floor(
                F.datediff(F.col("w").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            ).cast("int"),
        )
        .groupBy(
            # DATE-typed cohort: a weekly bucket has no sub-day content,
            # and engines disagree on date_trunc('week') return types
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def new_user_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """Growth curve: per time bucket, the number of FIRST-seen users and
    the running total of distinct users ever seen (exact cumulative
    uniques without cumulative-distinct state).

    The trick: cumulative-distinct over time is an O(users) state
    problem stated naively, but "first event per user" reduces it to a
    plain count — a user contributes to exactly one bucket (their min
    ts), so the cumulative distinct count is the prefix sum of new-user
    counts. Shapes: one per-user min agg (map-side combinable), one
    bucket-level count, and a prefix-sum window over the tiny
    bucket-count frame (single partition is fine — rows = number of
    buckets, not users).
    """
    first = df.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    per_bucket = first.groupBy(
        F.date_trunc(granularity, F.col("__first_ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_bucket.withColumn("cum_users", F.sum("n_new").over(w))
