"""As-of join operator (operators/asof.py): union+window pattern,
DuckDB-ASOF-equivalent semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(9)), (3, 20, _ts(4)), (4, 30, _ts(7))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(3), 1.0), (101, 10, _ts(5), 2.0), (102, 10, _ts(8), 3.0),
         (103, 20, _ts(6), 4.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_backward_asof_with_equal_ts_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="user_id",
                    right_payload=["event_id", "value"], right_order="event_id")
    got = {r.event_id: (r.asof_event_id, r.asof_value) for r in out.collect()}
    assert got == {
        1: (101, 2.0),   # equal ts matches (<= semantics)
        2: (102, 3.0),   # most recent preceding, not just any preceding
        3: (None, None), # right row for user 20 is later → no match
        4: (None, None), # user 30 has no right rows at all
    }


def test_tie_break_highest_order_wins(spark):
    left = spark.createDataFrame([(1, 10, _ts(5))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, _ts(3), 1.0), (101, 10, _ts(3), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on="ts", by="user_id",
                    right_payload=["event_id", "value"], right_order="event_id")
    r = out.collect()[0]
    assert (r.asof_event_id, r.asof_value) == (101, 2.0)


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="user_id",
                    right_payload=["event_id"], right_order="event_id",
                    tolerance_seconds=1.0)
    got = {r.event_id: r.asof_event_id for r in out.collect()}
    # left 1 at t=5 matches right at t=5 (age 0 ≤ 1); left 2 at t=9 has
    # best match t=8 (age 1 ≤ 1); everything else unmatched.
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_left_columns_survive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="user_id",
                    right_payload=["value"], right_order="value")
    assert set(out.columns) == {"event_id", "user_id", "ts", "asof_ts", "asof_value"}
    assert out.count() == 4


def test_plan_is_one_window_no_join(spark):
    # The whole point: an as-of via union+window shuffles ONCE on the key
    # and never materializes a range join.
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="user_id",
                    right_payload=["value"], right_order="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
