"""Sliding RANGE-frame window aggregates: boundary inclusivity, tied
timestamps as peers, per-key isolation, and the one-shuffle plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.sliding import sliding_window_agg


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "event_id long, k string, ts timestamp")


def test_trailing_window_hand_computed(spark):
    df = _mk(
        spark,
        [
            (1, "a", _ts("2024-01-01 00:00:00")),
            (2, "a", _ts("2024-01-01 00:05:00")),
            (3, "a", _ts("2024-01-01 00:10:00")),  # sees 1 (exactly -600s), 2, 3
            (4, "a", _ts("2024-01-01 00:20:01")),  # sees only itself
            (5, "b", _ts("2024-01-01 00:10:00")),  # other key, isolated
        ],
    )
    got = {
        r.event_id: r.n_window
        for r in sliding_window_agg(df, by="k", window_seconds=600).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


def test_tied_timestamps_are_peers(spark):
    # RANGE frame: all rows in the same microsecond share one window
    df = _mk(
        spark,
        [
            (1, "a", _ts("2024-01-01 00:00:00")),
            (2, "a", _ts("2024-01-01 00:00:00")),
            (3, "a", _ts("2024-01-01 00:00:00")),
        ],
    )
    got = {
        r.event_id: r.n_window
        for r in sliding_window_agg(df, by="k", window_seconds=600).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3}


def test_custom_aggs(spark):
    df = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:00:00"), 5.9),
            (2, "a", _ts("2024-01-01 00:01:00"), 2.1),
        ],
        "event_id long, k string, ts timestamp, v double",
    )
    out = sliding_window_agg(
        df, by="k", window_seconds=600,
        aggs={"s": F.sum(F.floor(F.col("v")).cast("long")),
              "m": F.max("v")},
    )
    rows = {r.event_id: (r.s, r.m) for r in out.collect()}
    assert rows == {1: (5, 5.9), 2: (7, 5.9)}


def test_single_exchange_plan(spark):
    df = _mk(spark, [(1, "a", _ts("2024-01-01 00:00:00"))])
    plan = sliding_window_agg(
        df, by="k", window_seconds=60
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
