"""Bucketed range join: boundary inclusivity, bucket-straddling matches,
equivalence with the naive inequality join, and the plan gate (hash
equi-join, never a nested-loop/cartesian)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.rangejoin import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp"
    )


def test_bounds_inclusive_lower_exclusive_upper(spark):
    left = _mk(spark, [(1, "a", _ts("2024-01-01 01:00:00"))])
    right = _mk(
        spark,
        [
            (10, "a", _ts("2024-01-01 00:50:00")),  # exactly ts-600 → in
            (11, "a", _ts("2024-01-01 00:49:59.999999")),  # 1µs early → out
            (12, "a", _ts("2024-01-01 00:59:59.999999")),  # last µs → in
            (13, "a", _ts("2024-01-01 01:00:00")),  # equal ts → out
            (14, "b", _ts("2024-01-01 00:55:00")),  # wrong key → out
        ],
    )
    got = sorted(
        r.r_event_id
        for r in range_join(
            left, right, on="ts", by="k", lower=-600, upper=0
        ).collect()
    )
    assert got == [10, 12]


def test_matches_straddling_bucket_boundary(spark):
    # window [ts-600, ts) straddles two 600s buckets when ts is not
    # bucket-aligned; both sides must be found
    left = _mk(spark, [(1, "a", _ts("2024-01-01 00:15:00"))])
    right = _mk(
        spark,
        [
            (10, "a", _ts("2024-01-01 00:06:00")),  # earlier bucket
            (11, "a", _ts("2024-01-01 00:12:00")),  # same bucket
        ],
    )
    got = sorted(
        r.r_event_id
        for r in range_join(
            left, right, on="ts", by="k", lower=-600, upper=0
        ).collect()
    )
    assert got == [10, 11]


def test_forward_and_symmetric_windows(spark):
    left = _mk(spark, [(1, "a", _ts("2024-01-01 00:00:00"))])
    right = _mk(
        spark,
        [
            (10, "a", _ts("2023-12-31 23:59:00")),
            (11, "a", _ts("2024-01-01 00:00:30")),
            (12, "a", _ts("2024-01-01 00:01:30")),
        ],
    )
    fwd = sorted(
        r.r_event_id
        for r in range_join(
            left, right, on="ts", by="k", lower=0, upper=60
        ).collect()
    )
    assert fwd == [11]  # includes ts itself? no row at ts; 00:00:30 only
    sym = sorted(
        r.r_event_id
        for r in range_join(
            left, right, on="ts", by="k", lower=-90, upper=120
        ).collect()
    )
    assert sym == [10, 11, 12]


def test_equals_naive_inequality_join(spark):
    # property check on a deterministic pseudo-random cloud
    rows = [
        (
            i,
            f"k{i % 7}",
            _ts("2024-01-01 00:00:00")
            + dt.timedelta(seconds=(i * 7919) % 86400),
        )
        for i in range(400)
    ]
    df = _mk(spark, rows)
    got = (
        range_join(
            df, df, on="ts", by="k", lower=-3600, upper=1800,
            left_cols=["event_id", "ts"], right_cols=["event_id"],
        )
        .select("event_id", "r_event_id")
        .collect()
    )
    l = df.alias("l")
    r = df.alias("r")
    naive = l.join(
        r,
        (F.col("l.k") == F.col("r.k"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 3600 SECONDS"))
        & (F.col("r.ts") < F.col("l.ts") + F.expr("INTERVAL 1800 SECONDS")),
    ).select(
        F.col("l.event_id").alias("event_id"),
        F.col("r.event_id").alias("r_event_id"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))


def test_null_ts_rows_drop(spark):
    left = spark.createDataFrame(
        [(1, "a", None), (2, "a", _ts("2024-01-01 00:05:00"))],
        "event_id long, k string, ts timestamp",
    )
    right = _mk(spark, [(10, "a", _ts("2024-01-01 00:04:00"))])
    got = range_join(left, right, on="ts", by="k", lower=-600, upper=0)
    assert [r.event_id for r in got.collect()] == [2]


def test_plan_is_hash_equi_join(spark):
    df = _mk(spark, [(1, "a", _ts("2024-01-01 00:00:00"))])
    plan = range_join(
        df, df, on="ts", by="k", lower=-600, upper=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_rejects_empty_window():
    import pytest

    with pytest.raises(ValueError):
        range_join(None, None, on="ts", by="k", lower=5, upper=5)
