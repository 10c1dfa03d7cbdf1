"""Batch-9 operators: exponential histogram, ROLLUP grouping sets,
Bloom pre-filter, skew report."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.bloomjoin import bloom_semi_filter
from cardinalhq_otel_collector_spark.operators.grouping import rollup_counts
from cardinalhq_otel_collector_spark.operators.histogram import exp_histogram
from cardinalhq_otel_collector_spark.operators.profile import skew_report


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# -------------------------------------------------------- exp histogram

def test_exp_bucket_boundaries(spark):
    # bucket i covers (2^i, 2^(i+1)]: 0.5 -> bucket -1 (boundary value,
    # (2^-2, 2^-1]), 0.6 -> 0? no: (2^-1, 2^0] holds 0.6 -> bucket -1+1=0...
    # hand-check: value > 2^e counts; 0.5 is NOT > 0.5 so it stays in (-2^-1] bucket.
    rows = [
        (1, "t", _ts("2024-01-01 01:00:00"), 0.5),    # (0.25, 0.5]  -> -2
        (2, "t", _ts("2024-01-01 01:00:00"), 0.6),    # (0.5, 1]     -> -1
        (3, "t", _ts("2024-01-01 01:00:00"), 1.0),    # (0.5, 1]     -> -1
        (4, "t", _ts("2024-01-01 01:00:00"), 1.5),    # (1, 2]       ->  0
        (5, "t", _ts("2024-01-01 01:00:00"), 300.0),  # (256, 512]   ->  8
        (6, "t", _ts("2024-01-01 01:00:00"), None),   # zero bucket (NULL idx)
        (7, "t", _ts("2024-01-01 01:00:00"), -3.0),   # zero bucket (NULL idx)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    out = {
        (r.bucket_idx, r.bucket_count)
        for r in exp_histogram(df, ["event_type"], "value", -7, 9, "1 day").collect()
    }
    assert out == {(-2, 1), (-1, 2), (0, 1), (8, 1), (None, 2)}


def test_exp_bucket_clamps(spark):
    rows = [
        (1, "t", _ts("2024-01-01 01:00:00"), 0.001),    # below 2^-7 -> underflow idx -8
        (2, "t", _ts("2024-01-01 01:00:00"), 9999.0),   # above 2^9 -> clamp 9
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    out = {r.bucket_idx for r in exp_histogram(df, ["event_type"], "value", -7, 9).collect()}
    assert out == {-8, 9}


# --------------------------------------------------------------- rollup

def test_rollup_levels_and_totals(spark):
    df = spark.createDataFrame(
        [("d1", "a", 1.0), ("d1", "a", 2.0), ("d1", "b", 3.0), ("d2", "a", 4.0)],
        "day string, event_type string, value double",
    )
    rows = rollup_counts(df, ["day", "event_type"], "value").collect()
    by = {(r.day, r.event_type, r.grouping_lvl): (r.n, r.total) for r in rows}
    assert by[("d1", "a", 0)] == (2, 3.0)
    assert by[("d1", None, 1)] == (3, 6.0)   # day subtotal
    assert by[(None, None, 3)] == (4, 10.0)  # grand total
    assert len(rows) == 3 + 2 + 1  # distinct detail groups + day subtotals + grand


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_deterministic(spark):
    big = spark.range(1000).select(F.col("id").alias("user_id"))
    small = spark.createDataFrame([(7,), (42,), (999,)], "user_id long")
    out = {r.user_id for r in bloom_semi_filter(big, small, "user_id", k=3, m=1024).collect()}
    assert {7, 42, 999} <= out            # every true member survives
    assert len(out) < 1000                # and the filter actually filters
    out2 = {r.user_id for r in bloom_semi_filter(big, small, "user_id", k=3, m=1024).collect()}
    assert out == out2                    # fixed hashes -> deterministic FPs


def test_bloom_empty_small_side_drops_everything(spark):
    big = spark.range(100).select(F.col("id").alias("user_id"))
    small = spark.createDataFrame([], "user_id long")
    assert bloom_semi_filter(big, small, "user_id").count() == 0


# ----------------------------------------------------------------- skew

def test_skew_report_shares_and_salts(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 25 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, ["k"], target_rows_per_task=10, top=2).collect()
    assert [(r.k, r.n, r.share_ppm, r.salt_factor) for r in out] == [
        ("hot", 70, 700000, 7),
        ("warm", 25, 250000, 3),
    ]
