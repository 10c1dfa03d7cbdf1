"""Batch-11 operators: histogram_quantile, PSI drift, changes-only
compaction, Z-order key."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.functions import z_order_key
from cardinalhq_otel_collector_spark.operators.histogram import (
    bucket_index,
    histogram_quantile,
)
from cardinalhq_otel_collector_spark.operators.profile import psi_drift
from cardinalhq_otel_collector_spark.operators.resample import changes_only


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------- histogram_quantile

def _hist(spark, counts, bounds):
    rows = [("k", i, n) for i, n in enumerate(counts)]
    return spark.createDataFrame(rows, "k string, bucket_idx int, bucket_count long")


def test_histogram_quantile_interpolates(spark):
    # bounds [10, 20]; counts: bucket0 (0,10] = 50, bucket1 (10,20] = 50
    # p50: rank 50 crosses at end of bucket0 -> 0 + 10*(50-0)/50 = 10.0
    h = _hist(spark, [50, 50], [10.0, 20.0])
    r = histogram_quantile(h, ["k"], [10.0, 20.0], 50, 100).collect()[0]
    assert r.bucket_idx == 0 and r.p500 == 10.0
    # p75 crosses in bucket1: 10 + 10*(75-50)/50 = 15.0
    r = histogram_quantile(h, ["k"], [10.0, 20.0], 75, 100).collect()[0]
    assert r.bucket_idx == 1 and r.p750 == 15.0


def test_histogram_quantile_overflow_clamps(spark):
    # everything in overflow bucket (idx 2): PromQL clamps to last bound
    h = _hist(spark, [0, 0, 100], [10.0, 20.0])
    r = histogram_quantile(h, ["k"], [10.0, 20.0], 95, 100).collect()[0]
    assert r.bucket_idx == 2 and r.p950 == 20.0


# ------------------------------------------------------------- PSI drift

def test_psi_zero_for_identical_distributions(spark):
    df = spark.createDataFrame([(float(v),) for v in (1, 15, 60, 300)], "value double")
    out = psi_drift(df, df, "value", [10.0, 50.0, 100.0, 250.0]).collect()
    assert all(r.psi_term == 0.0 for r in out)
    assert {r.bucket for r in out} == {0, 1, 2, 4}


def test_psi_positive_total_for_shifted_distribution(spark):
    old = spark.createDataFrame([(1.0,)] * 90 + [(60.0,)] * 10, "value double")
    new = spark.createDataFrame([(1.0,)] * 10 + [(60.0,)] * 90, "value double")
    out = psi_drift(old, new, "value", [10.0, 50.0, 100.0, 250.0]).collect()
    assert sum(r.psi_term for r in out) > 0.2  # the conventional alarm line


# ----------------------------------------------------------- changes only

def test_changes_only_compresses_flat_runs(spark):
    rows = [
        (1, 1, _ts("2024-01-01 00:00:01"), 5.2),  # first -> kept (floor 5)
        (2, 1, _ts("2024-01-01 00:00:02"), 5.9),  # floor 5, same -> dropped
        (3, 1, _ts("2024-01-01 00:00:03"), 6.0),  # floor 6 -> kept
        (4, 1, _ts("2024-01-01 00:00:04"), 6.1),  # dropped
        (5, 1, _ts("2024-01-01 00:00:05"), 5.0),  # back to 5 -> kept
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = sorted(r.event_id for r in changes_only(df, ["user_id"], "ts", "value", "event_id").collect())
    assert got == [1, 3, 5]


def test_changes_only_null_runs_compress(spark):
    rows = [
        (1, 1, _ts("2024-01-01 00:00:01"), None),
        (2, 1, _ts("2024-01-01 00:00:02"), None),  # NULL == NULL -> dropped
        (3, 1, _ts("2024-01-01 00:00:03"), 1.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = sorted(r.event_id for r in changes_only(df, ["user_id"], "ts", "value", "event_id").collect())
    assert got == [1, 3]


# --------------------------------------------------------------- z-order

def test_z_order_interleaves_bits(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    z = df.select(z_order_key(F.col("a"), F.col("b"), bits=4).alias("z")).collect()[0].z
    # a bits (even positions): 0,1,0,1 ; b bits (odd positions): 0,1,1,0
    # interleaved LSB-first: a0 b0 a1 b1 a2 b2 a3 b3 = 0 0 1 1 0 1 1 0 -> 0b01101100
    assert z == 0b01101100


def test_z_order_locality_beats_linear_key(spark):
    # neighbors in (a, b) space stay close in z-space: the max z-distance
    # over unit-neighbor pairs is far below the max under a (a*2^16+b) key
    df = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    )
    rows = df.select("a", "b", z_order_key(F.col("a"), F.col("b"), bits=4).alias("z")).collect()
    zmap = {(r.a, r.b): r.z for r in rows}
    max_neighbor_gap = max(
        abs(zmap[(a, b)] - zmap[(a + 1, b)]) for a in range(15) for b in range(16)
    )
    assert max_neighbor_gap < 16 * 16  # bounded by the quadrant size, not the range
